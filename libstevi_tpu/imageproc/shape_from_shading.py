"""Shape from shading.

Reference parity: `imageProcessing/shapeFromShading.h:34-1113` — initial
normal estimate from shading under a known light, iterative refinement
(shading data term + smoothness), normal -> height integration, and light
direction estimation.

TPU design: the refinement is gradient descent on a differentiable energy
(autodiff replaces the reference's hand-derived updates); height
integration is the Frankot-Chellappa FFT projection (exact least-squares
integrable surface) — everything is FFT + elementwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_light_direction(image: jnp.ndarray, normals: jnp.ndarray
                             ) -> jnp.ndarray:
    """Least-squares Lambertian light from known normals
    (`shapeFromShading.h` light estimation)."""
    I = image.astype(jnp.float32).ravel()
    N = normals.reshape(-1, 3)
    return jnp.linalg.lstsq(N, I)[0]


def initial_normal_map(image: jnp.ndarray, light: jnp.ndarray
                       ) -> jnp.ndarray:
    """Linearized initial normals: start from the light direction scaled to
    match the observed shading, bent toward the image gradient."""
    I = image.astype(jnp.float32)
    L = light / jnp.linalg.norm(light)
    gy = jnp.gradient(I, axis=0)
    gx = jnp.gradient(I, axis=1)
    # slant from shading: cos(theta) = I (clamped)
    ct = jnp.clip(I / jnp.maximum(jnp.linalg.norm(light), 1e-6), 0.0, 1.0)
    st = jnp.sqrt(1.0 - ct * ct)
    g = jnp.stack([gy, gx], -1)
    gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-6)
    # tilt along the negative image gradient
    n = jnp.stack([-gn[..., 1] * st, -gn[..., 0] * st, ct], -1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def refine_normals(image: jnp.ndarray, normals0: jnp.ndarray,
                   light: jnp.ndarray, smoothness: float = 0.1,
                   iters: int = 200, lr: float = 0.05) -> jnp.ndarray:
    """Minimize ||n . L - I||^2 + w ||grad n||^2 over unit normals."""
    I = image.astype(jnp.float32)
    L = jnp.asarray(light, jnp.float32)

    def energy(n):
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
        shade = jnp.einsum("hwc,c->hw", n, L)
        data = jnp.sum((shade - I) ** 2)
        gx = n[:, 1:] - n[:, :-1]
        gy = n[1:, :] - n[:-1, :]
        return data + smoothness * (jnp.sum(gx * gx) + jnp.sum(gy * gy))

    g = jax.grad(energy)

    def body(_, n):
        n = n - lr * g(n)
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                               1e-6)

    return jax.lax.fori_loop(0, iters, body, normals0)


def integrate_normals(normals: jnp.ndarray) -> jnp.ndarray:
    """Normals -> height via the Frankot-Chellappa integrability projection
    (`shapeFromShading.h` normal-to-height integration)."""
    n = normals.astype(jnp.float32)
    nz = jnp.where(jnp.abs(n[..., 2]) > 1e-4, n[..., 2], 1e-4)
    p = -n[..., 0] / nz   # dz/drow
    q = -n[..., 1] / nz   # dz/dcol
    H, W = p.shape
    wy = jnp.fft.fftfreq(H) * 2 * jnp.pi
    wx = jnp.fft.fftfreq(W) * 2 * jnp.pi
    WY, WX = jnp.meshgrid(wy, wx, indexing="ij")
    denom = WY * WY + WX * WX
    denom = denom.at[0, 0].set(1.0)
    Fz = (-1j * WY * jnp.fft.fft2(p) - 1j * WX * jnp.fft.fft2(q)) / denom
    Fz = Fz.at[0, 0].set(0.0)
    return jnp.real(jnp.fft.ifft2(Fz))


def shape_from_shading(image: jnp.ndarray, light: jnp.ndarray,
                       smoothness: float = 0.1, iters: int = 200):
    """Full pipeline: initial estimate -> refinement -> height integration.
    Returns (normals, height)."""
    n0 = initial_normal_map(image, jnp.asarray(light, jnp.float32))
    n = refine_normals(image, n0, light, smoothness, iters)
    return n, integrate_normals(n)
