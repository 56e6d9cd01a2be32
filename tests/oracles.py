"""Naive numpy oracles for kernel parity tests.

Replicates the reference's test pattern (`test/unittests/
test_correlation_utils.h:10-300` — `InneficientZNCC`, `InneficientSSD`, ...):
straightforward nested-loop implementations of the exact reference semantics,
against which the optimized JAX/Pallas kernels are compared.
"""

from __future__ import annotations

import numpy as np


def unfold_oracle(h_radius: int, v_radius: int, image: np.ndarray,
                  pad=None) -> np.ndarray:
    """Direct nested-loop unfold with zero fill; feature order (dy, dx, c)
    row-major (Rotate0), auto padding = radii."""
    if image.ndim == 2:
        image = image[:, :, None]
    H, W, C = image.shape
    h = 2 * h_radius + 1
    v = 2 * v_radius + 1
    if pad is None:
        pt = pb = v_radius
        pl = pr = h_radius
    else:
        pl, pt, pr, pb = pad
    out_h = H - v + pt + pb + 1
    out_w = W - h + pl + pr + 1
    out = np.zeros((out_h, out_w, v * h * C), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            for k in range(v):
                for l in range(h):
                    ii = i - pt + k
                    jj = j - pl + l
                    if 0 <= ii < H and 0 <= jj < W:
                        for c in range(C):
                            out[i, j, C * h * k + C * l + c] = image[ii, jj, c]
    return out


def census_oracle(fv: np.ndarray) -> np.ndarray:
    """Bit-pack (ref > val) against channel 0 into uint32 words, flushing the
    final partial word (documented deviation from `census.h:103-108`)."""
    F = fv.shape[-1]
    n_words = (F - 2) // 32 + 1
    out = np.zeros(fv.shape[:-1] + (n_words,), dtype=np.uint32)
    flat = fv.reshape(-1, F)
    oflat = out.reshape(-1, n_words)
    for p in range(flat.shape[0]):
        d = 0
        b = 0
        w = 0
        for c in range(1, F):
            g = 1 if flat[p, 0] > flat[p, c] else 0
            d |= g << b
            b += 1
            if b >= 32:
                oflat[p, w] = d
                w += 1
                d = 0
                b = 0
        if b > 0:
            oflat[p, w] = d
    return out


def normalize_oracle(fv: np.ndarray, zero_mean: bool, normalized: bool) -> np.ndarray:
    fv = fv.astype(np.float64)
    if zero_mean and normalized:
        mean = fv.mean(-1, keepdims=True)
        sig = np.sqrt(((fv - mean) ** 2).sum(-1, keepdims=True))
        return (fv - mean) / sig
    if zero_mean:
        return fv - fv.mean(-1, keepdims=True)
    if normalized:
        return fv / np.sqrt((fv ** 2).sum(-1, keepdims=True))
    return fv


def _compare(kernel: str, s: np.ndarray, t: np.ndarray) -> float:
    if kernel == "dot":
        return float(np.dot(s, t))
    if kernel == "ssd":
        return float(((s - t) ** 2).sum())
    if kernel == "sad":
        return float(np.abs(s - t).sum())
    if kernel == "medad":
        d = np.sort(np.abs(s - t))
        return float(d[len(d) // 2])
    if kernel == "hamming":
        x = np.bitwise_xor(s.astype(np.uint32), t.astype(np.uint32))
        return float(sum(bin(int(v)).count("1") for v in x))
    raise ValueError(kernel)


def aggregate_oracle(kernel: str, source_fv: np.ndarray, target_fv: np.ndarray,
                     disps, sign: int) -> np.ndarray:
    """cost[i, j, d] = compare(source[i,j], target[i, j + sign*disp_d]),
    zero target vector out of range (`cross_correlations.h:195-249`)."""
    H, W, F = source_fv.shape
    D = len(disps)
    cv = np.zeros((H, W, D))
    zero = np.zeros(F, dtype=target_fv.dtype)
    for i in range(H):
        for j in range(W):
            for k, d in enumerate(disps):
                jt = j + sign * d
                t = target_fv[i, jt] if 0 <= jt < W else zero
                cv[i, j, k] = _compare(kernel, source_fv[i, j], t)
    return cv


def wta_oracle(cv: np.ndarray, is_cost: bool) -> np.ndarray:
    """WTA with ties toward the LAST optimal index
    (`correlation_base.h:444-455`)."""
    H, W, D = cv.shape
    out = np.zeros((H, W), dtype=np.int32)
    for i in range(H):
        for j in range(W):
            best = cv[i, j, 0]
            sel = 0
            for d in range(1, D):
                v = cv[i, j, d]
                if (is_cost and v <= best) or (not is_cost and v >= best):
                    best = v
                    sel = d
            out[i, j] = sel
    return out


def sgm_oracle(cv: np.ndarray, P1: float, P2: float, is_cost: bool,
               n_dirs: int = 4, margins=(0, 0, 0, 0), Pout: float = 100.0
               ) -> np.ndarray:
    """Correct SGM recurrence (the reference's Score branch mirrored;
    `sgm.h:218-306`), sequential per line, O(D^2) inner loop.

    margins = (left, top, right, bottom).
    """
    H, W, D = cv.shape
    ml, mt, mr, mb = margins
    sgm = cv.astype(np.float64).copy()
    sign = 1.0 if is_cost else -1.0

    dir_steps = {
        4: [((1, 1), (0, 0)), ((-1, -1), (0, 0)), ((0, 0), (1, 1)), ((0, 0), (-1, -1))],
    }
    steps_list = list(dir_steps[4])
    if n_dirs >= 8:
        steps_list += [((1, 1), (1, 1)), ((-1, -1), (-1, -1)),
                       ((1, 1), (-1, -1)), ((-1, -1), (1, 1))]
    if n_dirs >= 16:
        steps_list += [((1, 1), (0, 1)), ((-1, -1), (0, -1)),
                       ((1, 1), (0, -1)), ((-1, -1), (0, 1)),
                       ((0, 1), (1, 1)), ((0, -1), (-1, -1)),
                       ((0, 1), (-1, -1)), ((0, -1), (1, 1))]

    def traverse(si, sj, sv, sh):
        prev = np.zeros(D)
        i, j, c = si, sj, 0
        while mt <= i < H - mb and ml <= j < W - mr:
            base = cv[i, j].astype(np.float64)
            best_p = prev.min() if is_cost else prev.max()
            cur = np.empty(D)
            for nd in range(D):
                cand = prev.copy()
                for od in range(D):
                    delta = abs(od - nd)
                    if delta == 1:
                        cand[od] += sign * P1
                    elif delta > 1:
                        cand[od] += sign * P2
                agg = cand.min() if is_cost else cand.max()
                if j + nd >= W:
                    agg += sign * Pout
                cur[nd] = base[nd] + (agg - best_p)
            sgm[i, j] += cur - base
            prev = cur
            i += sv[c % 2]
            j += sh[c % 2]
            c += 1

    for sv, sh in steps_list:
        # vertical start edge
        # NOTE: the reference's EndPos start (`sgm.h:331,345`) is one past the
        # last in-bounds position, so its traverse loop exits immediately and
        # reverse directions contribute nothing — an off-by-one bug.  The
        # oracle (and the kernel) implement the intended behavior: reverse
        # lines start at the last in-bounds position.
        if sh != (0, 0):
            sj = ml if (sh[0] >= 0 and sh[1] >= 0) else W - mr - 1
            for si in range(mt, H - mb):
                traverse(si, sj, sv, sh)
        if sv != (0, 0):
            si = mt if (sv[0] >= 0 and sv[1] >= 0) else H - mb - 1
            for sj in range(ml, W - mr):
                traverse(si, sj, sv, sh)
    return sgm
