"""Model factory: config -> Flax module (reference ``models/build.py:16-165``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .aff import AutoFocusFormer

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def build_model(config, upscale_ratios=None):
    """Instantiate the model named by ``config.MODEL.TYPE``.

    ``aff`` -> :class:`AutoFocusFormer`; ``maskfinerOT`` / ``maskfinerUD`` ->
    the MaskFiner wrappers (reference ``models/build.py:35-161``).
    ``upscale_ratios`` overrides the MaskFiner upsampling ratios (curriculum
    rebuild; parameter shapes are ratio-independent).
    """
    model_type = config.MODEL.TYPE
    dtype = _DTYPES[config.TPU.COMPUTE_DTYPE]
    # Per-preset lowering winner (config.py TPU.WF_MODE), threaded as a
    # module attribute; an explicit MLAFF_WF_MODE env still wins at trace
    # time (ops/clusten.py::wf_contract — A/B sweeps set the env directly).
    wf_mode = str(getattr(config.TPU, "WF_MODE", "") or "")
    merge_mode = str(getattr(config.TPU, "MERGE", "") or "")
    # The fused Pallas attention kernel is a custom call XLA's SPMD
    # partitioner cannot split over the mesh `model`/`seq` axes; with
    # tensor or sequence parallelism active, use the XLA einsum path
    # (which propagates the sharded layouts cleanly).
    use_pallas = (
        bool(config.TPU.USE_PALLAS)
        and jax.default_backend() == "tpu"
        and int(config.TPU.MESH_MODEL) <= 1
        and int(getattr(config.TPU, "MESH_SEQ", 1)) <= 1
    )

    if model_type == "aff":
        aff = config.MODEL.AFF
        return AutoFocusFormer(
            num_classes=config.MODEL.NUM_CLASSES,
            embed_dim=tuple(aff.EMBED_DIM),
            cluster_size=aff.CLUSTER_SIZE,
            nbhd_size=tuple(aff.NBHD_SIZE),
            alpha=aff.ALPHA,
            ds_rate=aff.DS_RATE,
            reserve_on=aff.RESERVE,
            depths=tuple(aff.DEPTHS),
            num_heads=tuple(aff.NUM_HEADS),
            mlp_ratio=aff.MLP_RATIO,
            drop_rate=config.MODEL.DROP_RATE,
            drop_path_rate=config.MODEL.DROP_PATH_RATE,
            patch_norm=aff.PATCH_NORM,
            layer_scale=aff.LAYER_SCALE,
            img_size=config.DATA.IMG_SIZE,
            use_pallas=use_pallas,
            wf_mode=wf_mode,
            merge_mode=merge_mode,
            remat=str(config.TPU.REMAT),
            dtype=dtype,
        )
    if model_type == "maskfinerOT":
        from .maskfiner_ot import build_oracle_teacher

        return build_oracle_teacher(config, dtype, upscale_ratios)
    if model_type == "maskfinerUD":
        from .maskfiner_ud import build_up_down

        return build_up_down(config, dtype, upscale_ratios)
    raise NotImplementedError(f"Unknown model type: {model_type}")
