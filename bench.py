"""Benchmark: AFF-Mini forward throughput on one chip vs the V100 baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference AFF-Mini at 1337 img/s on a single V100, measured with
the repo's own throughput mode (README.md:46, main.py:387-414). We replicate
that protocol: one batch, 50 warmup + 30 timed forwards.
"""

import json
import sys
import time

V100_BASELINE_FPS = 1337.0  # AFF-Mini, README.md:46
import os as _os

BATCH = int(_os.environ.get("MLAFF_BATCH", "128"))


def main() -> None:
    import os

    import jax

    # persistent compile cache: first-ever compile of the full model takes
    # minutes through the remote-compile path; subsequent runs are instant.
    # MLAFF_CACHE_DIR points at a throwaway dir for cold-compile timing.
    cache_dir = os.environ.get("MLAFF_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    model = AutoFocusFormer(
        num_classes=1000,
        embed_dim=(32, 128, 256, 384),
        cluster_size=8,
        nbhd_size=(48, 48, 48, 49),
        depths=(2, 2, 6, 2),
        num_heads=(2, 4, 8, 16),
        mlp_ratio=2.0,
        img_size=224,
        use_pallas=True,
        dtype=jnp.bfloat16,
    )
    # the tunneled chip lease occasionally takes minutes to (re)grant after
    # another process released it — retry backend init instead of failing
    # the whole bench on a transient UNAVAILABLE. A wedged lease service can
    # also make jax.devices() HANG forever (not raise); guard each attempt
    # with a watchdog thread so the bench fails loudly instead of blocking
    # the caller indefinitely.
    import threading

    def _init_backend_once(timeout_s: float) -> str:
        result = {}
        done = threading.Event()

        def work():
            try:
                jax.devices()
                result["ok"] = True
            except Exception as e:  # noqa: BLE001 — report any init failure
                result["err"] = e
            done.set()

        t = threading.Thread(target=work, daemon=True)
        t.start()
        if not done.wait(timeout_s):
            return "hang"
        return "ok" if result.get("ok") else f"err: {result.get('err')}"

    for attempt in range(6):
        status = _init_backend_once(timeout_s=300.0)
        if status == "ok":
            break
        print(f"# backend init attempt {attempt + 1}: {status}", file=sys.stderr)
        if attempt == 5:
            print("# giving up: TPU backend unavailable", file=sys.stderr)
            os._exit(1)  # a hung init thread cannot be joined; exit hard
        if status != "hang":
            time.sleep(60)

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 224, 224, 3), jnp.float32
    )
    from scripts.bench_common import host_init

    variables = host_init(model, rng, images[:1], training=False)

    # Chain CHUNK forwards inside one jit so per-dispatch tunnel latency
    # cannot pollute the measurement; perturb the input per iteration so XLA
    # cannot CSE the repeated pure calls. Completion is forced via a scalar
    # host readback (block_until_ready is unreliable through tunneled PJRT).
    # The fori_loop chain is the default (one body compile instead of CHUNK
    # inlined model copies — ~CHUNK x cheaper XLA compile); the on-chip A/B
    # measured fori 2490 img/s vs unroll 2414 (2026-08-18), so nothing is
    # lost. MLAFF_CHAIN=unroll restores the old protocol.
    CHUNK = 10

    if os.environ.get("MLAFF_CHAIN", "fori") == "fori":

        @jax.jit
        def fwd_chain(variables, images):
            def body(i, acc):
                logits = model.apply(
                    variables, images + i.astype(jnp.float32) * 1e-6,
                    training=False,
                )
                return acc + logits.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, CHUNK, body, jnp.float32(0.0))

    else:

        @jax.jit
        def fwd_chain(variables, images):
            acc = 0.0
            for i in range(CHUNK):
                logits = model.apply(
                    variables, images + jnp.float32(i) * 1e-6, training=False
                )
                acc = acc + logits.astype(jnp.float32).sum()
            return acc

    t0 = time.time()
    float(fwd_chain(variables, images))  # compile
    print(
        f"# compile {time.time() - t0:.1f}s "
        f"chain={os.environ.get('MLAFF_CHAIN', 'fori')}",
        file=sys.stderr,
    )
    # 4 warm chains + the compile chain = 50 warmup forwards, matching the
    # reference protocol's 50 warmup iterations (main.py:387-414) — the
    # first post-compile dispatches run before DVFS/caches settle.
    warm = [fwd_chain(variables, images) for _ in range(4)]
    float(warm[-1])
    # Queue all timed reps asynchronously and read back ONE scalar at the
    # end: executions on a single device run in dispatch order, so the last
    # readback implies all reps completed. This keeps exactly one tunnel
    # round-trip inside the timed window (a per-rep float() sync put ~3 RTTs
    # in it, which showed up as ±5% VM-to-VM "throughput" swings on
    # identical code). The remaining fixed apparatus overhead (first enqueue
    # + final readback RTT) is amortized over 24 chains (~12 s of steady
    # state); the reference's 30-iteration window (main.py:387-414) on a
    # local GPU has no such tunnel term to exclude.
    t1 = time.time()
    reps = 24
    accs = [fwd_chain(variables, images) for _ in range(reps)]
    float(accs[-1])
    t2 = time.time()
    fps = reps * CHUNK * BATCH / (t2 - t1)

    print(
        json.dumps(
            {
                "metric": "aff_mini_224_fwd_images_per_sec",
                "value": round(fps, 1),
                "unit": "img/s",
                "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
