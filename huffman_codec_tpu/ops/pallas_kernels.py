"""Hand-written Pallas TPU kernels for hot ops.

XLA's fusion already handles most of this codec's pipeline well (the
transforms are elementwise/scan-shaped), so Pallas is reserved for the
spots where XLA's lowering fights the hardware:

- ``histogram256``: per-chunk byte histograms. The natural scatter-add
  formulation serializes on TPU; the XLA-friendly broadcast-compare form
  (ops/canonical.py) relies on fusion to avoid materializing a
  (C, L, 256) compare. This kernel makes the blocking explicit: the chunk
  streams through VMEM in 2048-symbol blocks, each block's one-hot
  compare stays in registers and folds straight into a (256,) VMEM
  accumulator — HBM traffic is the input bytes + 1 KB of counts per
  chunk, the roofline for this op.

Each kernel takes an ``interpret`` flag for CPU-mode testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N_SYM = 256
_BLOCK = 2048  # symbols per inner step


def _hist_kernel(sym_ref, len_ref, out_ref):
    """One grid step = one chunk."""
    L = sym_ref.shape[1]
    n_blocks = L // _BLOCK
    length = len_ref[0]

    def body(b, acc):
        start = b * _BLOCK
        blk = sym_ref[0, pl.ds(start, _BLOCK)].astype(jnp.int32)
        pos = start + jax.lax.broadcasted_iota(
            jnp.int32, (_BLOCK, 1), 0)[:, 0]
        valid = pos < length
        # (BLOCK, 256) one-hot compare folded into the accumulator —
        # never leaves the core
        v = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, N_SYM), 1)
        eq = (blk[:, None] == v) & valid[:, None]
        return acc + jnp.sum(eq.astype(jnp.int32), axis=0)

    acc = jax.lax.fori_loop(0, n_blocks, body,
                            jnp.zeros((N_SYM,), jnp.int32))
    out_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram256(data: jax.Array, lengths: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """counts (C, 256) of the valid prefix of each (C, L) chunk row.

    L must divide by the internal block (2048); the codec's chunk sizes do.
    """
    C, L = data.shape
    if L % _BLOCK:
        raise ValueError(f"chunk length must divide by {_BLOCK}")
    return pl.pallas_call(
        _hist_kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, L), lambda c: (c, 0)),
            pl.BlockSpec((1,), lambda c: (c,)),
        ],
        out_specs=pl.BlockSpec((1, N_SYM), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((C, N_SYM), jnp.int32),
        interpret=interpret,
    )(data, lengths)
