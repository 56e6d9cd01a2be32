"""Scoped-VMEM limit discovery.

Mosaic kernels allocate from XLA's *scoped* VMEM pool (16 MB by default
on v5e).  The pool size is a libtpu flag
(``--xla_tpu_scoped_vmem_limit_kib``) passed via ``LIBTPU_INIT_ARGS`` —
the client-side ``XLA_FLAGS`` parser rejects it — and the remote compile
service honors it (measured round 5: the CV Hb=480 configuration that
Mosaic-OOMs at the default limit compiles at a 64 MB pool,
`scripts/exp_r5_vmemflag.py`).

Every scope-acceptance bound in the kernel dispatchers derives from this
one parsed value, so raising the pool re-opens the configurations the
16 MB default forces down (HD D=320: split up-pass, rc=1 row chunks,
lane-chunked WTA, banded CV instead of resident).  The calibrated
bounds keep their measured offsets relative to the default pool, which
preserves bit-for-bit default behavior when the flag is absent.
"""
import os
import re

DEFAULT_SCOPED_VMEM = 16 * 1024 * 1024


def scoped_vmem_bytes() -> int:
    """The scoped-VMEM pool size in bytes: parsed from LIBTPU_INIT_ARGS
    when --xla_tpu_scoped_vmem_limit_kib is present, else the 16 MB
    default."""
    m = re.search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)",
                  os.environ.get("LIBTPU_INIT_ARGS", ""))
    return int(m.group(1)) * 1024 if m else DEFAULT_SCOPED_VMEM


def scope_delta() -> int:
    """Bytes of scoped VMEM above (or below) the 16 MB default — the
    shift every calibrated acceptance bound moves by."""
    return scoped_vmem_bytes() - DEFAULT_SCOPED_VMEM
