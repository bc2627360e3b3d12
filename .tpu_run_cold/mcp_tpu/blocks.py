"""Per-player block-vector bookkeeping.

The reference leans on BlockArrays.jl (`mortar`/`Block`/`blocks`) for
per-player stacking throughout (e.g. src/game.jl:67-81). In JAX the idiomatic
equivalent is explicit static (offset, size) metadata over flat arrays
(SURVEY.md §2.5): a `Blocking` carries the static sizes and provides
split/concat that lower to static slices — free under XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Blocking:
    """Static block sizes for a flat vector; split/concat helpers."""

    sizes: tuple[int, ...]

    def __post_init__(self):
        object.__setattr__(self, "sizes", tuple(int(s) for s in self.sizes))

    @property
    def total(self) -> int:
        return sum(self.sizes)

    @property
    def offsets(self) -> tuple[int, ...]:
        out, acc = [], 0
        for s in self.sizes:
            out.append(acc)
            acc += s
        return tuple(out)

    def split(self, v: Array) -> tuple[Array, ...]:
        out = []
        for off, size in zip(self.offsets, self.sizes):
            out.append(jax.lax.slice_in_dim(v, off, off + size))
        return tuple(out)

    def block(self, v: Array, i: int) -> Array:
        off = self.offsets[i]
        return jax.lax.slice_in_dim(v, off, off + self.sizes[i])

    def __len__(self) -> int:
        return len(self.sizes)


def concat_blocks(blocks: Sequence[Array], dtype=None) -> Array:
    """Concatenate per-player blocks (zero-size blocks allowed, mirroring
    BlockArrays' zero-size-block tolerance noted at src/game.jl:65-66)."""
    blocks = [jnp.asarray(b) for b in blocks]
    if dtype is None:
        dtype = jnp.result_type(*[b.dtype for b in blocks]) if blocks else jnp.float32
    if not blocks:
        return jnp.zeros((0,), dtype)
    return jnp.concatenate([b.astype(dtype).reshape(-1) for b in blocks])


def blocking_of(blocks: Sequence[Array]) -> Blocking:
    return Blocking(tuple(int(jnp.asarray(b).size) for b in blocks))
