"""Deterministic host-side RNG for scene construction and noise tables.

The reference builds procedural content (Perlin tables, the random-balls
scene) with default-seeded std::minstd_rand engines (noise.h:166-213,
Scene/scene.h:103-104), making scenes bit-reproducible run to run. We keep
that property with the same LCG family: x -> 48271*x mod (2^31 - 1), seed 1.
(The exact double stream of MSVC's uniform_real_distribution is
implementation-defined and not reproduced; SURVEY.md §7 calls for statistical,
not bitwise, RNG parity.)
"""
from __future__ import annotations

import numpy as np

MINSTD_A = 48271
MINSTD_M = 2147483647  # 2**31 - 1


class MinStd:
    """Stateful minstd engine yielding uniforms in [0, 1)."""

    def __init__(self, seed: int = 1):
        self.x = seed

    def uniform(self) -> float:
        self.x = (self.x * MINSTD_A) % MINSTD_M
        return (self.x - 1) / (MINSTD_M - 1)


def minstd_stream(n: int, seed: int = 1) -> np.ndarray:
    """First n uniforms of a default-seeded minstd engine."""
    eng = MinStd(seed)
    return np.array([eng.uniform() for _ in range(n)], dtype=np.float64)
