"""MaskFiner-UD (mini preset) forward throughput on one chip.

The fork's own research path (``maskfinerUD``) has no published reference
numbers (SURVEY.md §6) — this records our TPU number so regressions are
visible. Same chained-jit protocol as bench.py.

Usage: python scripts/bench_maskfiner.py [batch]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHUNK = 2  # 7-backbone model: keep the unrolled chain compile-sized
           # (CHUNK=4 pushed the remote compile past 50 min)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ml_autofocusformermod_tpu", "configs", "maskfiner_up_down_mini.yaml",
    )
    config = load_config(cfg_path)
    config.defrost()
    config.TPU.COMPUTE_DTYPE = "bfloat16"
    config.freeze()
    model = build_model(config)

    images = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.float32
    )
    # abstract init + host-built leaves: a device model.init would
    # remote-compile the whole 7-backbone init graph (~9.5 min measured,
    # see PERF.md); parameter values don't affect throughput timing
    from bench_common import host_init

    t0 = time.time()
    variables = host_init(
        model,
        {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(7)},
        images[:1], training=False,
    )
    print(f"[init {time.time() - t0:.1f}s host-side]", file=sys.stderr)

    @jax.jit
    def fwd_chain(variables, images):
        acc = 0.0
        for i in range(CHUNK):
            out = model.apply(
                variables, images + jnp.float32(i) * 1e-6, training=False,
                rngs={"upsample": jax.random.PRNGKey(7)},
            )
            logits = out[-1] if isinstance(out, (list, tuple)) else out
            acc = acc + logits.astype(jnp.float32).sum()
        return acc

    float(fwd_chain(variables, images))  # compile
    float(fwd_chain(variables, images))  # warm
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        float(fwd_chain(variables, images))
    t2 = time.time()
    fps = reps * CHUNK * batch / (t2 - t1)
    print(json.dumps({
        "metric": "maskfiner_ud_mini_224_fwd_images_per_sec",
        "value": round(fps, 1),
        "unit": "img/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
