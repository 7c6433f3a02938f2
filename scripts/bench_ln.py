"""Microbench: LayerNormFp32 lowering A/B at model-representative shapes.

The MLAFF_LN env knob picks the lowering at trace time, so this runs both
variants in one process by re-tracing. Chained-jit protocol (64 calls per
measurement) like bench.py. Usage:

    python scripts/bench_ln.py [b] [n] [c]

Default sweeps the AFF-Mini/Small stage shapes.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp


def measure(shape, mode):
    os.environ["MLAFF_LN"] = mode
    from ml_autofocusformermod_tpu.models.layers import LayerNormFp32

    ln = LayerNormFp32(epsilon=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    params = ln.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def chain(params, x):
        acc = jnp.float32(0.0)
        for i in range(64):
            y = ln.apply(params, x + jnp.bfloat16(i) * jnp.bfloat16(1e-3))
            acc = acc + y.astype(jnp.float32).sum()
        return acc

    float(chain(params, x))
    float(chain(params, x))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        float(chain(params, x))
    ms = (time.time() - t0) / (reps * 64) * 1e3
    return ms


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if len(sys.argv) == 4:
        shapes = [tuple(int(a) for a in sys.argv[1:4])]
    else:
        shapes = [
            (128, 3136, 32), (128, 784, 128), (128, 196, 256),  # mini
            (128, 784, 192), (128, 196, 384), (128, 49, 768),   # small
        ]
    for shape in shapes:
        dot = measure(shape, "dot")
        vpu = measure(shape, "vpu")
        print(
            {"shape": shape, "dot_ms": round(dot, 4), "vpu_ms": round(vpu, 4),
             "speedup": round(vpu / dot, 2)},
            flush=True,
        )


if __name__ == "__main__":
    main()
