"""Hand-written Pallas TPU kernels for hot ops.

XLA's fusion already handles most of this codec's pipeline well (the
transforms are elementwise/scan-shaped), so Pallas is reserved for the
spots where XLA's lowering fights the hardware (all numbers measured on
the v5e with micro_rle.py / micro_pack.py, 16.8 MB grid):

- ``histogram256``: per-chunk byte histograms. The natural scatter-add
  formulation serializes on TPU; the XLA-friendly broadcast-compare form
  (ops/canonical.py) relies on fusion to avoid materializing a
  (C, L, 256) compare. This kernel makes the blocking explicit: the chunk
  streams through VMEM in 2048-symbol blocks, each block's one-hot
  compare stays in registers and folds straight into a (256,) VMEM
  accumulator — HBM traffic is the input bytes + 1 KB of counts per
  chunk, the roofline for this op.

- ``lane_pack``: the canonical entropy encode hot path (per-symbol code
  lookup + MSB-first bit packing). XLA's per-element ops are hopeless
  here: a 256-entry ``take_along_axis`` costs ~10.6 ns/element (237 ms for
  the grid) and every scatter ~14 ns/index (233-352 ms). Both become MXU
  one-hot matmuls instead: symbols -> one_hot(sym) @ nibble-table, and
  placement -> one_hot(target word) @ nibble-windows. Contributions to one
  word have disjoint BITS, so nibble-wise f32 sums (<= 15) are exact and
  sum == OR. Lanes are word-aligned in the v3 wire format (<= 31 pad bits
  per lane) so packing is lane-LOCAL — no cross-lane carry, no global
  merge; the host strips inter-lane padding with one boolean mask.

Each kernel takes an ``interpret`` flag for CPU-mode testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SYM = 256
_LANES = 128  # TPU minor (lane) dimension
_SLAB_ROWS = 8  # sublane rows folded per inner step (8 x 128 = 1024 syms);
# must be a multiple of the i32 sublane tile (8) so the dynamic row slice
# inside the loop is provably aligned for Mosaic


def pick_block(L: int) -> int:
    """Supported inner block size when the chunk length is Pallas-tileable
    (0 otherwise — caller falls back to the XLA formulation). Chunk rows
    are viewed as (L/128, 128) tiles; the inner step folds 4 rows."""
    return _SLAB_ROWS * _LANES if L % (_SLAB_ROWS * _LANES) == 0 else 0


def _hist_kernel(len_ref, sym_ref, out_ref):
    """One grid step = one chunk, viewed as (R, 128) byte rows.

    ``len_ref`` is the scalar-prefetch operand (SMEM) — dynamic scalar
    indexing is only legal there, not on VMEM vectors."""
    R = sym_ref.shape[1]
    length = len_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (_SLAB_ROWS, _LANES, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_SLAB_ROWS, _LANES, 1), 0)
    v = jax.lax.broadcasted_iota(
        jnp.int32, (_SLAB_ROWS, _LANES, N_SYM), 2)

    def body(b, acc):
        r0 = b * _SLAB_ROWS
        blk = sym_ref[0, pl.ds(r0, _SLAB_ROWS), :]
        pos = (r0 + row[..., 0]) * _LANES + col[..., 0]
        valid = pos < length
        # (8, 128, 256) one-hot compare folded into the accumulator —
        # ~1 MB of vregs, never leaves the core
        eq = (blk[:, :, None] == v) & valid[:, :, None]
        return acc + jnp.sum(eq.astype(jnp.int32), axis=(0, 1))

    acc = jax.lax.fori_loop(0, R // _SLAB_ROWS, body,
                            jnp.zeros((N_SYM,), jnp.int32))
    out_ref[0, 0, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram256(data: jax.Array, lengths: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """counts (C, 256) of the valid prefix of each (C, L) chunk row.

    L must divide by 512 (the codec's lane-aligned chunk lengths do);
    check with ``pick_block`` before calling.
    """
    C, L = data.shape
    if not pick_block(L):
        raise ValueError(f"chunk length must divide by {_SLAB_ROWS * _LANES}")
    R = L // _LANES
    # i32 tiles: the i8 sublane tile is 32, which would force 32-row slabs;
    # widening outside the kernel keeps the slab at 8 rows (~1 MB compare)
    tiles = data.reshape(C, R, _LANES).astype(jnp.int32)
    return pl.pallas_call(
        _hist_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths ride in SMEM
            grid=(C,),
            in_specs=[pl.BlockSpec((1, R, _LANES), lambda c, lens: (c, 0, 0))],
            # (C, 1, 256) so the block's last two dims match the array's
            out_specs=pl.BlockSpec((1, 1, N_SYM), lambda c, lens: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, N_SYM), jnp.int32),
        interpret=interpret,
    )(lengths.astype(jnp.int32), tiles)[:, 0, :]
