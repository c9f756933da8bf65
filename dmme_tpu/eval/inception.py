"""InceptionV3 feature extractor in flax — for FID (pool3, 2048-d) and IS
(logits).

The reference computes FID/IS through torchmetrics' bundled torch
InceptionV3 (src/dmme/lit_modules/ddpm.py:58-63), which is pytorch-fid's
**FID-standard** network: the TF-ported ``pt_inception-2015-12-05`` weights
on a modified torchvision topology — 1008 logits, ``count_include_pad=False``
average pooling in the A/C blocks and in Mixed_7b, and a *max* branch pool
in Mixed_7c. Published FID numbers are only comparable through that exact
network, so ``variant="fid"`` reproduces it; ``variant="torchvision"`` keeps
the stock 1000-class topology for torchvision checkpoints.

The architecture is implemented NHWC in linen, inference-only: every
Conv+BatchNorm pair is represented as a single biased conv, with the BN
folded in exactly at weight-conversion time (W' = W·γ/√(σ²+ε),
b' = β − γμ/√(σ²+ε)) — fewer ops, same function. Golden-tested against a
from-scratch torch twin with shared weights (tests/test_inception_parity.py).

Weights: this environment has no network egress. :func:`load_torch_weights`
converts a locally provided state_dict (``torch.load``-able file —
pytorch-fid's ``pt_inception-2015-12-05-6726825d.pth`` for the FID variant,
torchvision's ``inception_v3_google-0cc3c7bd.pth`` for the stock one; the
variant is auto-detected from the fc shape) into the flax param tree;
``scripts/convert_inception.py`` does it offline to a portable ``.npz``.
Without a weights file the network is randomly initialized — the FID/IS
*machinery* still runs end-to-end, but metric values are only meaningful
with real weights (documented limitation; see docs/evaluation.md).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-3


class ConvBN(nn.Module):
    """Conv + (folded) BN + ReLU. ``padding`` follows torch conv semantics."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            use_bias=True,
        )(x)
        return nn.relu(x)


def _avg_pool_3x3_s1(x, count_include_pad: bool = True):
    # torchvision InceptionA/C/E branch_pool: avg_pool2d(3, stride=1, pad=1).
    # torchvision uses count_include_pad=True (mean over the padded window);
    # pytorch-fid's FID blocks pass count_include_pad=False (mean over valid
    # elements only — pytorch_fid/inception.py FIDInceptionA/C/E_1).
    return nn.avg_pool(
        x,
        (3, 3),
        strides=(1, 1),
        padding=((1, 1), (1, 1)),
        count_include_pad=count_include_pad,
    )


def _max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    fid: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    #: branch_pool pooling: "avg" (torchvision), "avg_fid" (avg with
    #: count_include_pad=False — FIDInceptionE_1 / Mixed_7b), or "max"
    #: (FIDInceptionE_2 / Mixed_7c).
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_s1(x, count_include_pad=self.pool == "avg")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool3 features (N, 2048), logits (N, num_classes)).

    ``variant="fid"`` = pytorch-fid's FID-standard network (the one behind
    every published FID number and the reference's torchmetrics metric):
    1008 logits, valid-only average pooling in A/C/Mixed_7b, max branch
    pool in Mixed_7c. ``variant="torchvision"`` = stock inception_v3.
    """

    num_classes: Optional[int] = None  # default: 1008 for fid, 1000 otherwise
    variant: str = "fid"

    @nn.compact
    def __call__(self, x):
        fid = self.variant == "fid"
        n_cls = self.num_classes or (1008 if fid else 1000)
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, fid=fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid=fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid=fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid=fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid=fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid=fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid=fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg_fid" if fid else "avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max" if fid else "avg", name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)
        logits = nn.Dense(n_cls, name="fc")(feats)
        return feats, logits


def preprocess(images: jax.Array) -> jax.Array:
    """[0,1] NHWC any size → 299×299, scaled to [−1, 1] (the FID network's
    own preprocessing convention)."""
    n, h, w, c = images.shape
    if (h, w) != (299, 299):
        images = jax.image.resize(images, (n, 299, 299, c), method="bilinear")
    return images * 2.0 - 1.0


def load_torch_weights(params: Any, path: str) -> Any:
    """Fold a torchvision ``inception_v3`` state_dict into the flax tree.

    Each ``<name>.conv.weight`` + ``<name>.bn.{weight,bias,running_mean,
    running_var}`` quintuple becomes one biased NHWC conv kernel. ``fc``
    maps directly. Unknown/aux keys are ignored.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}

    flat = dict(_flatten(params["params"]))
    for prefix in {k.rsplit(".conv.weight", 1)[0] for k in sd if k.endswith(".conv.weight")}:
        w = sd[f"{prefix}.conv.weight"]  # (O, I, kh, kw)
        gamma = sd[f"{prefix}.bn.weight"]
        beta = sd[f"{prefix}.bn.bias"]
        mean = sd[f"{prefix}.bn.running_mean"]
        var = sd[f"{prefix}.bn.running_var"]
        scale = gamma / np.sqrt(var + BN_EPS)
        w_folded = (w * scale[:, None, None, None]).transpose(2, 3, 1, 0)  # HWIO
        b_folded = beta - mean * scale
        key = tuple(prefix.split(".")) + ("Conv_0",)
        flat[key + ("kernel",)] = jnp.asarray(w_folded)
        flat[key + ("bias",)] = jnp.asarray(b_folded)
    if "fc.weight" in sd:
        flat[("fc", "kernel")] = jnp.asarray(sd["fc.weight"].T)
        flat[("fc", "bias")] = jnp.asarray(sd["fc.bias"])
    return {"params": _unflatten(flat)}


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _unflatten(flat: Dict[tuple, Any]):
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


def save_npz(params: Any, path: str) -> None:
    """Persist a (BN-folded) flax param tree as a portable ``.npz`` — lets
    the one-time torch conversion happen offline (scripts/convert_inception.py)
    and evaluation boxes skip the torch dependency."""
    flat = {
        "/".join(k): np.asarray(v) for k, v in _flatten(params["params"])
    }
    np.savez(path, **flat)


def load_npz(path: str) -> Any:
    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(data[k]) for k in data.files}
    return {"params": _unflatten(flat)}


def detect_variant(weights_path: str) -> Tuple[str, int]:
    """(variant, num_classes) from a weights file's fc shape: 1008 outputs =
    pytorch-fid's pt_inception-2015-12-05, anything else = torchvision."""
    if weights_path.endswith(".npz"):
        n_cls = int(np.load(weights_path)["fc/kernel"].shape[1])
    else:
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        n_cls = int(sd["fc.weight"].shape[0])
    return ("fid" if n_cls == 1008 else "torchvision"), n_cls


def make_feature_fn(
    weights_path: Optional[str] = None,
    num_classes: Optional[int] = None,
    variant: str = "auto",
):
    """Build ``(images_0_1) -> (feats, logits)`` jitted on demand.

    ``variant="auto"``: detected from the weights file when given (1008-way
    fc ⇒ FID-standard network), else the FID topology — the convention the
    reference's torchmetrics FID/IS uses, so absolute values line up with
    published numbers. With ``weights_path=None`` the net is randomly
    initialized (machinery test mode — see module docstring).
    """
    if variant == "auto":
        if weights_path is not None:
            variant, n_cls = detect_variant(weights_path)
            num_classes = num_classes or n_cls
        else:
            variant = "fid"
    model = InceptionV3(num_classes=num_classes, variant=variant)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32)
    )
    if weights_path is not None:
        if weights_path.endswith(".npz"):
            params = load_npz(weights_path)
        else:
            params = load_torch_weights(params, weights_path)

    @jax.jit
    def feature_fn(images):
        return model.apply(params, preprocess(images))

    return feature_fn
