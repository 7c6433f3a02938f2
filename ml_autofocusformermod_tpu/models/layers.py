"""Core AFF building blocks (Flax linen), mirroring reference semantics.

Module/parameter names deliberately track the reference torch module tree
(``/root/reference/models/aff_transformer.py``) so the ``.pth`` checkpoint
importer (:mod:`..ckpt.pth_import`) is a near-identity name map.

Numerical conventions preserved for logit parity:
* padding mask adds ``(1-mask) * (-100)`` (not -inf) — ``aff_transformer.py:137``
* a learned "blank" K/V token is appended as an extra softmax slot and peeled
  off after — ``aff_transformer.py:139-147``
* LayerNorm runs in float32 even when the compute dtype is bfloat16 (matches
  torch AMP autocast behavior the reference trains with)
* the relative-position lookup table rows are ``(dx, dy, dist, sin, cos)``
  with NaN/Inf zeroed at the center — ``aff_transformer.py:14-32``
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cluster_gather import gather_clusters_onehot, gather_rows
from ..ops.clusten import clusten_av, clusten_qk, clusten_wf, wf_contract
from ..ops.knn import knn, nearest_other_distance
from ..ops.merge_pallas import fused_cluster_merge


class HashableArray:
    """Immutable, hashable numpy-array wrapper.

    ``jax.checkpoint``'s ``static_argnums`` require hashable values, but the
    on-grid stages thread host-constant numpy geometry (``static_ncc`` /
    ``static_pos``) through the block call. Wrapping them keeps the arrays
    static under :func:`remat_wrap` instead of being traced (which would
    break the Pallas kernels' host-side window planning).
    """

    __slots__ = ("arr", "_key")

    def __init__(self, arr):
        self.arr = np.asarray(arr)
        self.arr.setflags(write=False)
        self._key = (self.arr.shape, str(self.arr.dtype), self.arr.tobytes())

    def __array__(self, dtype=None, copy=None):
        return self.arr if dtype is None else self.arr.astype(dtype)

    @property
    def shape(self):
        return self.arr.shape

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, HashableArray) and self._key == other._key


def _unwrap_static(x):
    return x.arr if isinstance(x, HashableArray) else x


def remat_wrap(block_cls, mode: str, static_argnums: Tuple[int, ...]):
    """Gate a transformer-block class behind ``jax.checkpoint`` (lifted).

    ``mode``: ``""`` — off (returns the class unchanged); ``"blocks"`` —
    full per-block rematerialization (backward recomputes the block forward
    from its inputs, so no block-interior activation is kept live across
    the loss); ``"dots"`` — same region but with
    ``dots_with_no_batch_dims_saveable``, which keeps matmul outputs and
    recomputes only the cheap elementwise interior (less memory saved,
    less recompute). ``static_argnums`` index the block's ``__call__`` with
    ``self`` at 0 and must cover every non-array argument.
    """
    if not mode:
        return block_cls
    policy = None
    if mode == "dots":
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif mode != "blocks":
        raise ValueError(f"Unknown remat mode: {mode!r} (use '', 'blocks', 'dots')")
    return nn.remat(
        block_cls,
        prevent_cse=True,
        policy=policy,
        static_argnums=static_argnums,
    )

Dtype = Any

POS_DIM = 2


@functools.lru_cache(maxsize=None)
def build_pe_table(img_size: int) -> Tuple[int, int, np.ndarray]:
    """Relative-position lookup table (reference ``aff_transformer.py:14-32``).

    Returns ``(rel_pos_width, table_width, table)`` with ``table`` of shape
    ``(table_width**2, 5)``: rows are ``(dx, dy, dist, sin, cos)`` for all
    integer offsets in ``[-R, R]^2``, ``R = img_size // 4 - 1``.
    """
    rel_pos_width = img_size // 4 - 1
    table_width = 2 * rel_pos_width + 1
    delta = np.arange(table_width, dtype=np.float32) - rel_pos_width
    ys, xs = np.meshgrid(delta, delta, indexing="ij")
    with np.errstate(divide="ignore", invalid="ignore"):
        dist = np.sqrt(ys**2 + xs**2)
        sin = ys / dist
        cos = xs / dist
    table = np.stack([xs, ys, dist, sin, cos], axis=2)
    table[~np.isfinite(table)] = 0.0
    return rel_pos_width, table_width, table.reshape(-1, 5)


def _layer_norm_fp32(norm: nn.LayerNorm, x: jax.Array) -> jax.Array:
    """Apply LayerNorm in float32, return in the input dtype."""
    return norm(x.astype(jnp.float32)).astype(x.dtype)


class LayerNormFp32(nn.Module):
    """LayerNorm in float32 with channel statistics as MXU ones-matmuls.

    XLA lowers a lane-axis (channel) reduce as per-row cross-lane
    shuffles whose packed scalar outputs force relayouts — measured
    30-60x off memory roofline at AFF shapes (a (128,784,192) LN costs
    ~1.15 ms on v5e; the models carry ~60 LNs). Lowering the two sums as
    ``(rows, c) @ (c, 1)`` matmuls puts them on the otherwise-idle MXU at
    memory speed — in isolation. The model-level A/B (PERF.md, 2026-08-19:
    dot 2467 vs vpu 2483 img/s on AFF-Mini) and the six-shape microbench
    both favor the plain reduce, so ``vpu`` is the default and
    ``MLAFF_LN=dot`` opts into the MXU lowering.

    Parameters are named ``scale``/``bias`` with flax.linen.LayerNorm's
    shapes and inits, so checkpoints and the .pth importer see an
    identical tree. Variance uses flax's fast-variance form
    ``E[x^2] - E[x]^2`` (``use_fast_variance=True`` semantics), computed
    in f32 like the reference's AMP autocast LayerNorm.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        if os.environ.get("MLAFF_LN", "vpu") == "dot":
            lead = x32.shape[:-1]
            xf = x32.reshape(-1, c)
            ones = jnp.full((c, 1), 1.0 / c, jnp.float32)
            mean = jax.lax.dot_general(
                xf, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            mean2 = jax.lax.dot_general(
                xf * xf, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            y = y * scale[None, :] + bias[None, :]
            return y.reshape(*lead, c).astype(x.dtype)
        mean = x32.mean(-1, keepdims=True)
        var = jnp.maximum(
            (x32 * x32).mean(-1, keepdims=True) - mean * mean, 0.0
        )
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


def rel_pos_features(rel_pos: jax.Array, rel_pos_width: int) -> jax.Array:
    """(dx, dy, dist, sin, cos) computed directly from table-frame coords.

    ``rel_pos`` is ``pos_j - pos_i + R``; values are bit-identical to the
    reference's precomputed-table rows (``aff_transformer.py:14-32``) since
    sqrt/divide are correctly-rounded on both sides — on TPU five elementwise
    values beat gathering from a lookup table, so the table never exists at
    runtime.
    """
    R = rel_pos_width
    dx = rel_pos[..., 0] - R
    dy = rel_pos[..., 1] - R
    dist = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(dist == 0, 1.0, dist)
    sin = jnp.where(dist == 0, 0.0, dy / safe)
    cos = jnp.where(dist == 0, 0.0, dx / safe)
    return jnp.stack([dx, dy, dist, sin, cos], axis=-1)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm ``DropPath`` semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class AffineHead(nn.Module):
    """Dense layer whose weights are directly readable (``.kernel``/``.bias``)
    so the fused Pallas kernel can evaluate the same affine map in-kernel.
    Parameter layout identical to ``nn.Dense`` (checkpoint-compatible)."""

    in_features: int
    features: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", trunc_normal_init(), (self.in_features, self.features)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        y = x.astype(self.dtype) @ self.kernel.astype(self.dtype)
        return y + self.bias.astype(self.dtype)


class Mlp(nn.Module):
    """fc -> GELU -> drop -> fc -> drop (reference ``aff_transformer.py:35-51``)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(
            self.hidden_features, dtype=self.dtype,
            kernel_init=trunc_normal_init(), name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features, dtype=self.dtype,
            kernel_init=trunc_normal_init(), name="fc2",
        )(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class ClusterAttention(nn.Module):
    """Local attention over gathered neighborhoods (``aff_transformer.py:54-163``).

    In global mode attends densely over all tokens. In local mode attention is
    computed against each token's ``member_idx`` neighborhood via the CLUSTEN
    ops. A learned per-head relative-position bias is looked up from the
    precomputed table, padding slots are masked with -100, and a learned blank
    K/V token provides a softmax sink.
    """

    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    rel_pos_width: int = 55
    clamp_width: int = 0  # MixRes clamps rel coords to the table; 0 = off
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat: jax.Array,  # b x n x c
        member_idx: Optional[jax.Array],  # b x n x m (None if global)
        cluster_mask: Optional[jax.Array],  # b x n x m (1 = valid)
        global_attn: bool,
        pe_feat: Optional[jax.Array],  # b x n x m x 5 (None on the fused path)
        deterministic: bool = True,
        nearest_cluster: Optional[jax.Array] = None,  # b x n x nnc
        cluster_size: int = 0,
        pos: Optional[jax.Array] = None,  # b x n x 2 (fused path)
        static_ncc=None,  # host-constant (n, nnc) np copy of nearest_cluster
        static_pos=None,  # host-constant (n, 2) np copy of pos (on-grid)
    ) -> jax.Array:
        b, n, c = feat.shape
        h = self.num_heads
        c_ = c // h
        scale = c_**-0.5

        # the fused kernel supports in-kernel attention-prob dropout
        # (hash-mask, ops/clusten_pallas.py::_drop_keep) whenever the
        # per-head width is sublane-aligned — which holds for every
        # preset (c_ = 32); the XLA fallback only remains for exotic
        # head widths (the Pallas backward, mandatory under dropout,
        # needs c_ % 8 == 0)
        fused = (
            self.use_pallas
            and not global_attn
            and nearest_cluster is not None
            and pos is not None
            and (self.attn_drop == 0.0 or deterministic or c_ % 8 == 0)
        )

        q = nn.Dense(
            c, dtype=self.dtype, kernel_init=trunc_normal_init(), name="q"
        )(feat)
        q = q * scale
        kv = nn.Dense(
            2 * c, dtype=self.dtype, kernel_init=trunc_normal_init(), name="kv"
        )(feat)

        # learned per-head relative position bias from rel-pos features
        pos_embed = AffineHead(5, h, dtype=self.dtype, name="pos_embed")

        blank_k = self.param("blank_k", nn.initializers.normal(1.0), (c,))
        blank_v = self.param("blank_v", nn.initializers.normal(1.0), (c,))

        if fused:
            from ..ops.clusten_pallas import fused_cluster_attention

            drop_rate = 0.0 if deterministic else float(self.attn_drop)
            drop_seed = None
            if drop_rate > 0.0:
                # per-call int32 seed from the standard 'dropout' stream;
                # the kernels expand it to per-element masks via a
                # stateless coordinate hash (fwd/bwd reproduce it exactly)
                drop_seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            # token-major straight through: q (b,n,c) / kv (b,n,2c) feed the
            # kernel exactly as projected — no head splits at the XLA level
            out = fused_cluster_attention(
                q, kv, nearest_cluster, pos,
                pos_embed.kernel, pos_embed.bias,
                blank_k.reshape(h, c_).T, blank_v.reshape(h, c_),
                h, cluster_size, self.rel_pos_width, self.clamp_width,
                static_ncc=static_ncc, static_pos=static_pos,
                drop_rate=drop_rate, drop_seed=drop_seed,
            )
        else:
            q = q.reshape(b, n, h, c_).transpose(0, 2, 1, 3)  # b h n c_
            kv = kv.reshape(b, n, h, 2, c_).transpose(3, 0, 2, 1, 4)
            key, v = kv[0], kv[1]  # b h n c_
            blank_attn = (
                q * blank_k.astype(q.dtype).reshape(1, h, 1, c_)
            ).sum(-1, keepdims=True)  # b h n 1
            bias = pos_embed(pe_feat.astype(self.dtype)).transpose(0, 3, 1, 2)
            if global_attn:
                attn = jnp.einsum(
                    "bhic,bhjc->bhij", q, key, preferred_element_type=self.dtype
                )
                # masked-dense mode (MLAFF_DENSE_NMAX routing): cluster_mask
                # is a (b, n, n) neighborhood mask — non-neighbors get the
                # same -100 additive mask the gathered path applies to
                # padded slots (exp(-100) vanishes under the f32 softmax)
                mask = (
                    None
                    if cluster_mask is None
                    else cluster_mask.reshape(b, 1, n, n)
                )
                key_g = v_g = None
            else:
                mask = cluster_mask
                if nearest_cluster is not None:
                    # cluster-granularity one-hot gather rides the MXU
                    key_g = gather_clusters_onehot(
                        key, nearest_cluster, cluster_size
                    )
                    v_g = gather_clusters_onehot(v, nearest_cluster, cluster_size)
                    attn = jnp.einsum(
                        "bhic,bhimc->bhim", q, key_g,
                        preferred_element_type=self.dtype,
                    )
                else:
                    key_g = v_g = None
                    attn = clusten_qk(q, key, member_idx)  # b h n m
                if mask is not None:
                    mask = mask.reshape(b, 1, n, attn.shape[-1])

            attn = attn + bias

            if mask is not None:
                attn = attn + (1 - mask.astype(attn.dtype)) * (-100.0)

            attn = jnp.concatenate([attn, blank_attn], axis=-1)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

            blank_w = attn[..., -1:]
            attn = attn[..., :-1]
            blank_out = blank_w * blank_v.astype(attn.dtype).reshape(1, h, 1, c_)

            if global_attn:
                out = jnp.einsum(
                    "bhij,bhjc->bhic", attn, v, preferred_element_type=self.dtype
                )
            elif v_g is not None:
                out = jnp.einsum(
                    "bhim,bhimc->bhic", attn, v_g,
                    preferred_element_type=self.dtype,
                )
            else:
                out = clusten_av(attn, v, member_idx)
            out = (out + blank_out).transpose(0, 2, 1, 3).reshape(b, n, c)

        out = nn.Dense(
            c, dtype=self.dtype, kernel_init=trunc_normal_init(), name="proj"
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class ClusterTransformerBlock(nn.Module):
    """Pre-LN attention + MLP residual block (``aff_transformer.py:166-243``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_scale: float = 0.0
    use_pallas: bool = False
    rel_pos_width: int = 55
    clamp_width: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat: jax.Array,
        member_idx: Optional[jax.Array],
        cluster_mask: Optional[jax.Array],
        global_attn: bool,
        pe_feat: Optional[jax.Array],
        deterministic: bool = True,
        nearest_cluster: Optional[jax.Array] = None,
        cluster_size: int = 0,
        pos: Optional[jax.Array] = None,
        static_ncc=None,
        static_pos=None,
    ) -> jax.Array:
        # host-constant geometry may arrive wrapped for remat staticness
        static_ncc = _unwrap_static(static_ncc)
        static_pos = _unwrap_static(static_pos)
        shortcut = feat
        x = LayerNormFp32(epsilon=1e-5, name="norm1")(feat)
        x = ClusterAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_pallas=self.use_pallas,
            rel_pos_width=self.rel_pos_width,
            clamp_width=self.clamp_width,
            dtype=self.dtype,
            name="attn",
        )(x, member_idx, cluster_mask, global_attn, pe_feat, deterministic,
          nearest_cluster=nearest_cluster, cluster_size=cluster_size, pos=pos,
          static_ncc=static_ncc, static_pos=static_pos)

        drop_path = DropPath(self.drop_path, name="drop_path")
        norm2 = LayerNormFp32(epsilon=1e-5, name="norm2")
        mlp = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )

        use_layer_scale = (
            self.layer_scale is not None
            and isinstance(self.layer_scale, (int, float))
            and self.layer_scale > 0
        )
        if use_layer_scale:
            gamma1 = self.param(
                "gamma1",
                nn.initializers.constant(self.layer_scale),
                (self.dim,),
            )
            gamma2 = self.param(
                "gamma2",
                nn.initializers.constant(self.layer_scale),
                (self.dim,),
            )
            feat = shortcut + drop_path(gamma1.astype(x.dtype) * x, deterministic)
            y = mlp(norm2(feat), deterministic)
            feat = feat + drop_path(gamma2.astype(y.dtype) * y, deterministic)
        else:
            feat = shortcut + drop_path(x, deterministic)
            y = mlp(norm2(feat), deterministic)
            feat = feat + drop_path(y, deterministic)
        return feat


class ClusterMerging(nn.Module):
    """Adaptive downsampling (``aff_transformer.py:246-365``).

    Selects ``keep_num = int(n * ds_rate)`` merge centers per image:
    a grid prior (stride-2 lattice at stage 1, adaptive elsewhere) plus
    ``alpha *`` detached learned importance, with coarse-grid reserve tokens
    forced in; then merges each center's neighborhood by PointConv
    (weight_net over the pe table, x importance, x mask) via CLUSTEN-WF.
    """

    dim: int
    out_dim: int
    alpha: float = 4.0
    ds_rate: float = 0.25
    reserve_on: bool = True
    rel_pos_width: int = 55
    wf_mode: str = ""  # '' = env/code default (ops/clusten.py::wf_contract)
    merge_mode: str = ""  # '' = env/code default ('pallas' = fused merge kernel)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pos: jax.Array,  # b x n x 2
        feat: jax.Array,  # b x n x c
        member_idx: jax.Array,  # b x n x m
        cluster_mask: Optional[jax.Array],  # b x n x m
        learned_prob: Optional[jax.Array],  # b x n x 1
        stride: int,
        reserve_num: int,
        nearest_cluster: Optional[jax.Array] = None,  # b x n x nnc
        cluster_size: int = 0,
    ) -> Tuple[jax.Array, jax.Array]:
        b, n, c = feat.shape
        d = pos.shape[2]
        keep_num = int(n * self.ds_rate)

        # --- grid prior (aff_transformer.py:295-301) ---
        if stride == 2:
            grid_prob = ((pos % stride).sum(-1) == 0).astype(jnp.float32)
        else:
            min_dist = nearest_other_distance(pos)  # b x n
            ada_stride = 2.0 ** (jnp.ceil(jnp.log2(min_dist)) + 1)  # b x n
            grid_prob = (
                (pos.astype(jnp.int32) % ada_stride[..., None].astype(jnp.int32))
                .sum(-1)
                == 0
            ).astype(jnp.float32)

        final_prob = grid_prob

        # --- learned importance, detached for selection (.:306-309) ---
        if learned_prob is not None:
            lp_detached = jax.lax.stop_gradient(learned_prob).reshape(b, n)
            final_prob = final_prob + lp_detached.astype(jnp.float32) * self.alpha

        # --- reserve tokens on a coarse grid (.:311-317) ---
        if self.reserve_on:
            reserve_mask = ((pos % (stride * 2)).sum(-1) == 0).astype(jnp.float32)
            final_prob = final_prob + reserve_mask * (-100.0)
            sample_num = keep_num - reserve_num
        else:
            sample_num = keep_num

        # --- top-k merge centers; reserve indices appended (.:320-326) ---
        _, sample_idx = jax.lax.top_k(final_prob, sample_num)  # b x n_
        if self.reserve_on:
            # exactly reserve_num tokens have reserve_mask == 1 (the coarse
            # grid survives every previous downsampling round by
            # construction); top_k on the mask lists them in index order,
            # matching the reference's nonzero() extraction (.:323)
            _, reserve_idx = jax.lax.top_k(reserve_mask, reserve_num)
            idx = jnp.concatenate([sample_idx, reserve_idx], axis=-1)
        else:
            idx = sample_idx
        idx = idx[..., None]  # b x keep_num x 1

        assert idx.shape[1] == keep_num, "selected count != keep_num"

        # --- gather pos / nbhd / rel-features / mask for selected centers ---
        nbhd_size = member_idx.shape[-1]
        flat_idx = idx[..., 0]  # b x keep_num
        new_pos = jnp.take_along_axis(pos, idx, axis=1)
        sel_member_idx = gather_rows(member_idx, flat_idx)
        if cluster_mask is not None:
            sel_mask = gather_rows(cluster_mask, flat_idx)
        else:
            sel_mask = None
        sel_ncc = (
            gather_rows(nearest_cluster, flat_idx)
            if nearest_cluster is not None
            else None
        )
        # --- rel-pos features at the selected centers (.:336,343-350) ---
        # MLAFF_AUX_GATHER=fused folds [pos, learned_prob] into one cluster
        # gather; the chip A/B (R2N-A1..A3) measured fused-vs-split within
        # noise (2465 vs 2475), so the simpler split gathers are the
        # default. learned_prob is NOT detached here: pointconv weights
        # carry grad (aff_transformer.py:340)
        R = self.rel_pos_width
        if sel_ncc is not None:
            if os.environ.get("MLAFF_AUX_GATHER", "split") == "fused":
                aux = pos.astype(jnp.float32)
                if learned_prob is not None:
                    aux = jnp.concatenate(
                        [aux, learned_prob.astype(jnp.float32)], axis=-1
                    )
                aux_g = gather_clusters_onehot(
                    aux[:, None], sel_ncc, cluster_size
                )[:, 0]  # b x n' x m x (d [+ 1])
                pos_g = aux_g[..., :d]
                if learned_prob is not None:
                    lp = aux_g[..., d:]  # b x n' x m x 1
            else:
                # split-gather A/B path (pre-c5ad098 shape)
                if learned_prob is not None:
                    lp = gather_clusters_onehot(
                        learned_prob[:, None], sel_ncc, cluster_size
                    )[:, 0]
                pos_g = gather_clusters_onehot(
                    pos[:, None], sel_ncc, cluster_size
                )[:, 0]
        else:
            if learned_prob is not None:
                lp = jnp.take_along_axis(
                    learned_prob, sel_member_idx.reshape(b, -1, 1), axis=1
                ).reshape(b, keep_num, nbhd_size, 1)
            pos_g = gather_rows(
                pos, sel_member_idx.reshape(b, -1)
            ).reshape(b, keep_num, nbhd_size, d)
        sel_rel = rel_pos_features(
            pos_g - (new_pos[:, :, None, :] - R), R
        )

        # --- pointconv weights from rel-pos features (.:343-358) ---
        weight_net_dense = nn.Dense(
            4, dtype=self.dtype, kernel_init=trunc_normal_init(),
            name="weight_net_fc",
        )
        weight_net_norm = LayerNormFp32(epsilon=1e-5, name="weight_net_norm")
        wt = weight_net_dense(sel_rel.astype(self.dtype))
        weights = nn.gelu(
            weight_net_norm(wt), approximate=False
        )  # b x n' x m x 4
        inner_ch = weights.shape[-1]

        if learned_prob is not None:
            if sel_mask is not None:
                lp = lp * sel_mask[..., None].astype(lp.dtype)
            weights = weights * lp.astype(weights.dtype)
        elif sel_mask is not None:
            weights = weights * sel_mask[..., None].astype(weights.dtype)

        # --- merge (CLUSTEN-WF), norm, project (.:361-363) ---
        if sel_ncc is not None:
            # DEFAULT pallas ON TPU since the r3f chip A/Bs (2026-08-21):
            # the v3 fused merge kernel wins mini 2820.4 -> 3130.2 (+11%,
            # 2.341x V100) and Small 1048.6 -> 1108.4 (+5.7%, 3.453x).
            # Off-TPU the default is the XLA one-hot chain — the compiled
            # Pallas lowering is TPU-only and the interpreter is far
            # slower than XLA on CPU (merge must run everywhere CLUSTEN
            # did, reference aff_transformer.py:361).  MLAFF_MERGE /
            # TPU.MERGE override either way ('pallas' off-TPU
            # auto-interprets, see ops/merge_pallas.py::_interpret).
            merge_mode = (
                os.environ.get("MLAFF_MERGE", "")
                or self.merge_mode
                or ("pallas" if jax.default_backend() == "tpu" else "xla")
            )
            if merge_mode == "pallas":
                # fused kernel: the gathered (b, n'*m, c) features stay in
                # VMEM (ops/merge_pallas.py) — the XLA chain below
                # materializes them twice (~9.6 ms/iter of the AFF-Mini
                # b128 forward profile)
                merged = fused_cluster_merge(
                    weights, feat.astype(weights.dtype), sel_ncc,
                    cluster_size,
                )
            else:
                feat_g = gather_clusters_onehot(
                    feat[:, None], sel_ncc, cluster_size
                )[:, 0]  # b x n' x m x c
                merged = wf_contract(weights, feat_g.astype(weights.dtype),
                                     mode=self.wf_mode)
        else:
            merged = clusten_wf(weights, feat, sel_member_idx)  # b n' ic c
        merged = merged.reshape(b, keep_num, inner_ch * c)
        merged = LayerNormFp32(epsilon=1e-5, name="norm")(merged)
        merged = nn.Dense(
            self.out_dim, dtype=self.dtype, kernel_init=trunc_normal_init(),
            name="linear",
        )(merged)
        return new_pos, merged


class PatchEmbed(nn.Module):
    """Stride-4 conv patch embedding emitting features + integer grid positions
    (``aff_transformer.py:511-553``). Input/output layout is NHWC (TPU-native).
    """

    embed_dim: int = 32
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, training: bool = False
    ) -> Tuple[jax.Array, jax.Array, int, int]:
        # x: b x H x W x 3
        x = nn.Conv(
            self.embed_dim // 2, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, name="proj1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.embed_dim, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, name="proj2",
        )(x)
        b, h, w, c = x.shape
        feat = x.reshape(b, h * w, c)
        if self.use_norm:
            feat = LayerNormFp32(epsilon=1e-5, name="norm")(feat)

        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        pos = jnp.stack([xs, ys], axis=2).reshape(1, h * w, 2)
        pos = jnp.broadcast_to(pos, (b, h * w, 2)).astype(jnp.float32)
        return pos, feat, h, w
