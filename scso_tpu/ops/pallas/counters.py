"""Trace-time kernel-hit counters.

Each fused-kernel wrapper bumps its counter when the PALLAS path is
actually taken (not the jnp fallback). Counts are per-trace, not
per-execution — under jit a kernel traced once runs every iteration —
so they answer the engagement question: "did this solve route through
the fused kernel at all?" Benchmarks assert on them so a silent
shape-based fallback (the round-1 n % 128 trap at the north-star
n = 10⁴) can never masquerade as a fused-kernel measurement again.
"""

from __future__ import annotations

KERNEL_HITS: dict = {
    "fused_normal_matvec": 0,
    "fused_score_update": 0,
    "fused_two_loop": 0,
    "fused_glm_prep": 0,
    "fused_glm_prep_pair": 0,
    "fused_mglm_matvec": 0,
}


def bump(name: str) -> None:
    KERNEL_HITS[name] = KERNEL_HITS.get(name, 0) + 1


def reset() -> None:
    for k in KERNEL_HITS:
        KERNEL_HITS[k] = 0
