"""Load the reference torch models on CPU as parity oracles.

The reference hard-requires its CUDA extension (``clusten/clusten.py:8-14``)
and pykeops; neither runs on CPU. We inject:

* a fake ``clusten`` module whose ops use the pure-torch gather/einsum
  formulas the reference itself declares as ground truth
  (``clusten/test_qk_kernel.py:39-40`` etc.),
* a fake ``timm.models.layers`` (DropPath = identity in eval, torch's own
  trunc_normal_),
* a ``knn_keops`` replacement with exact integer-arithmetic distances and
  ``lax.top_k``-style lowest-index tie-breaking, so both frameworks pick
  identical neighbor sets.

This makes the untouched reference ``aff_transformer.py`` importable and
runnable on CPU for full-model logit comparisons.
"""

import importlib.util
import sys
import types

import numpy as np

REFERENCE_MODELS = "/root/reference/models"


def _install_fake_clusten():
    import torch

    mod = types.ModuleType("clusten")

    class CLUSTENQKFunction:
        @staticmethod
        def apply(query, key, nn_idx):
            b, h, n, c = query.shape
            m = nn_idx.shape[-1]
            key_gather = key.gather(
                index=nn_idx.reshape(b, 1, -1, 1).expand(-1, h, -1, c), dim=2
            ).reshape(b, h, n, m, c)
            return (query.unsqueeze(3) * key_gather).sum(-1)

    class CLUSTENAVFunction:
        @staticmethod
        def apply(attn, v, nn_idx):
            b, h, n, m = attn.shape
            c = v.shape[-1]
            v_gather = v.gather(
                index=nn_idx.reshape(b, 1, -1, 1).expand(-1, h, -1, c), dim=2
            ).reshape(b, h, n, m, c)
            return (attn.unsqueeze(4) * v_gather).sum(3)

    class CLUSTENWFFunction:
        @staticmethod
        def apply(weights, feat, nn_idx):
            b, n_, m = nn_idx.shape
            c = feat.shape[-1]
            feat_gather = feat.gather(
                index=nn_idx.reshape(b, -1, 1).expand(-1, -1, c), dim=1
            ).reshape(b, n_, m, c)
            return weights.transpose(-1, -2) @ feat_gather

    mod.CLUSTENQKFunction = CLUSTENQKFunction
    mod.CLUSTENAVFunction = CLUSTENAVFunction
    mod.CLUSTENWFFunction = CLUSTENWFFunction
    sys.modules["clusten"] = mod


def _install_cuda_to_noop():
    """The MixRes code hardcodes ``.to('cuda')`` on some tensors
    (``mixres_vit.py:395``, ``maskfiner_up_down.py:148``); make that a
    no-op so the reference runs on CPU."""
    import torch

    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and args[0] == "cuda":
            return self
        if kwargs.get("device") == "cuda":
            kwargs = {k: v for k, v in kwargs.items() if k != "device"}
            if not args and not kwargs:
                return self
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = to


def _install_fake_timm():
    import torch
    from torch import nn

    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    layers.DropPath = DropPath
    layers.trunc_normal_ = lambda t, std=1.0, **kw: torch.nn.init.trunc_normal_(
        t, std=std, a=-2.0, b=2.0
    )

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    timm.models = models
    models.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules["timm.models.layers"] = layers


def _exact_knn(query, database, k, return_dist=False):
    """Mirror ops.knn exactly: |q|^2+|d|^2-2qd in f32 + lowest-index ties."""
    import torch

    q = query.detach().float().numpy()
    d = database.detach().float().numpy()
    d2 = (
        (q**2).sum(-1)[:, :, None]
        + (d**2).sum(-1)[:, None, :]
        - 2.0 * np.einsum("bqc,bdc->bqd", q, d)
    ).astype(np.float32)
    order = np.argsort(d2, axis=2, kind="stable")[:, :, :k]
    idx = torch.from_numpy(np.ascontiguousarray(order)).long()
    if return_dist:
        dist = np.sqrt(np.maximum(np.take_along_axis(d2, order, 2), 0.0))
        return idx, torch.from_numpy(dist.astype(np.float32))
    return idx


def _our_cluster(pos, m, h, w, no_reorder=False, sf_type="", use_anchor=True):
    """Run the torch reference on OUR clustering (numpy backend).

    The sort keys tie on regular grids and torch's unstable sort then groups
    tied tokens differently from our stable sort — both clusterings are valid
    but produce ~1e-3-level feature differences. Tie-aware clustering parity
    is covered by test_sfc; injecting our clustering here isolates the
    numerical parity of everything else.
    """
    import torch

    from ml_autofocusformermod_tpu.ops import sfc

    out = sfc._cluster_impl(
        pos.detach().float().numpy(), m, h, w, no_reorder, sf_type, use_anchor, np
    )

    def conv(x, as_long=False):
        if x is None:
            return None
        t = torch.from_numpy(np.ascontiguousarray(x))
        return t.long() if as_long else t

    if no_reorder:
        mean_pos, member_idx, mask = out
        return conv(mean_pos), conv(member_idx, True), conv(mask, True)
    pos_s, mean_pos, member_idx, mask, ranking = out
    return (
        conv(pos_s),
        conv(mean_pos),
        conv(member_idx, True),
        conv(mask, True),
        conv(ranking, True),
    )


def load_reference_package():
    """Import /root/reference/models as the package ``refmodels`` with fakes
    and the exact-kNN patch installed. Returns the package module."""
    if "refmodels" in sys.modules:
        return sys.modules["refmodels"]

    _install_fake_clusten()
    _install_fake_timm()
    _install_cuda_to_noop()

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [REFERENCE_MODELS]
    sys.modules["refmodels"] = pkg

    spec = importlib.util.spec_from_file_location(
        "refmodels.point_utils", f"{REFERENCE_MODELS}/point_utils.py"
    )
    point_utils = importlib.util.module_from_spec(spec)
    sys.modules["refmodels.point_utils"] = point_utils
    spec.loader.exec_module(point_utils)
    # patch BEFORE aff_transformer binds them at import
    point_utils.knn_keops = _exact_knn
    point_utils.space_filling_cluster = _our_cluster

    for name in ("aff_transformer", "mixres_vit", "mixres_neighbour",
                 "maskfiner_up_down", "maskfiner_oracle_teacher_model"):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", f"{REFERENCE_MODELS}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        try:
            spec.loader.exec_module(mod)
        except Exception as e:  # optional families may have extra deps
            sys.modules.pop(f"refmodels.{name}", None)
            print(f"ref_oracle: could not load {name}: {e}")
            continue
        setattr(pkg, name, mod)
    pkg.point_utils = point_utils
    return pkg
