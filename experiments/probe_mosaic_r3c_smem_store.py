import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(i_ref, v_ref, o_ref, smem):
    for s in range(8):
        smem[s] = 0
    smem[i_ref[0]] = v_ref[0]          # dynamic SMEM store
    smem[i_ref[1]] = v_ref[1]
    acc = jnp.zeros((8, 128), jnp.int32)
    for s in range(8):
        acc = acc + jnp.where(jax.lax.broadcasted_iota(jnp.int32, (8,128), 0) == s, smem[s], 0)
    o_ref[:] = acc

try:
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
        interpret=False,
    )(jnp.asarray([3,6], jnp.int32), jnp.asarray([111,222], jnp.int32))
    o = np.asarray(out)
    ok = (o[3,0]==111) and (o[6,0]==222) and (o[0,0]==0)
    print(f"dynamic SMEM store LOWERS; correct={ok}")
except Exception as e:
    print(f"does NOT lower: {type(e).__name__}: {str(e)[:300]}")
