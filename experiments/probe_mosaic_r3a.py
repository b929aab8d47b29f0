"""Round-3 probe A: does a dynamic-offset VMEM vector load lower on v5e?

cache_ref[pl.ds(scalar * 8, 8), :] with a traced scalar would let the
fetch read ONE selected slot line per ray group (per-group shortlist)
instead of unrolling over all S slots — the round-3 fetch-cost unlock
(NOTES_ROUND3.md).  Run on TPU: prints LOWERS or the Mosaic error.
"""

import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(idx_ref, x_ref, o_ref, scratch):
    scratch[:] = x_ref[:]
    s = idx_ref[0]  # traced scalar slot index
    o_ref[:] = scratch[pl.ds(s * 8, 8), :]


def main():
    x = jnp.arange(4 * 8 * 128, dtype=jnp.int32).reshape(32, 128)
    idx = jnp.asarray([2], jnp.int32)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((32, 128), jnp.int32)],
            interpret=False,
        )(idx, x)
        ok = np.array_equal(np.asarray(out), np.asarray(x[16:24]))
        print(f"dynamic-offset VMEM load LOWERS; correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"does NOT lower: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
