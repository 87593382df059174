"""Per-jit XLA compiler options for the decode hot path.

XLA:TPU's memory-space-assignment pass pre-stages large pallas-call
operands (the q4 weight/scale planes) into VMEM as async sliced copies.
At 7B decode dims the copies hide behind compute, but at 13B dims the
program exposes ~1.4 ms/step of `slice-done`/`copy-done` waits right
before the kernels — the same kernels run slice-free in isolation
(BASELINE.md round-2 table). Raising MSA's minimum overlap-to-copy ratio
makes those marginal prefetches ineligible, so kernel operands stay in
HBM and the kernel's own double-buffered DMA (which IS overlapped) does
the staging. Measured (v5e, profiler device totals, 8-layer 13B dims):
slice+copy waits 415 -> 0 us/step, q4 matmul time unchanged (+1%); 7B
profile unchanged.

The `vf` flag family is the one the v5e backend consults (verified
empirically — the jf/gf variants exist but had to be distinguished by
effect). Decode-only: prefill is compute-bound and MSA prefetching is
left at its defaults there.
"""
from __future__ import annotations

import jax

DECODE_VMEM_OPTS = {
    "xla_vf_vmem_min_overlap_to_async_copy_ratio": "100",
    "xla_vf_vmem_preferred_overlap_to_async_copy_ratio": "200",
}


def decode_compiler_options() -> dict | None:
    """Compiler options for decode-step jits (None off-TPU: the flag names
    are TPU debug options and other backends reject them). Escape hatch:
    FASTLLAMA_XLA_OPTS=0 disables them (A/B measurement, future backends
    where MSA behaves differently)."""
    import os
    if os.environ.get("FASTLLAMA_XLA_OPTS", "1") == "0":
        return None
    if jax.default_backend() != "tpu":
        return None
    return dict(DECODE_VMEM_OPTS)
