"""Standalone FID tool — pytorch-fid CLI parity on this framework's stack.

Usage:
    python scripts/fid.py PATH1 PATH2 [--weights w.npz] [--batch-size 64]
    python scripts/fid.py PATH --save-stats stats.npz [--weights w.npz]

Each PATH may be:
  * a directory of images (png/jpg/jpeg/bmp/webp),
  * a ``.npy`` array of images — (N,H,W,C) float in [0,1] or uint8
    (e.g. the output of ``dmme_tpu.trainer predict``),
  * a precomputed statistics ``.npz`` with keys ``mu``/``sigma``
    (pytorch-fid convention — the published per-dataset stats files work).

Prints ``FID: <value>``. With real (pt_inception-2015-12-05) weights the
values are comparable to pytorch-fid / published numbers; without weights
the network is randomly initialized and values are only self-consistent
(the same machinery-test caveat as dmme_tpu.trainer test).
"""


from __future__ import annotations
if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import os
import sys

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _iter_batches(path: str, batch_size: int):
    if path.endswith(".npy"):
        arr = np.load(path)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        assert arr.ndim == 4, f"want (N,H,W,C), got {arr.shape}"
        for i in range(0, len(arr), batch_size):
            yield arr[i : i + batch_size]
        return

    from PIL import Image

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith(IMG_EXTS)
    )
    assert files, f"no images under {path}"
    batch = []
    size = None
    for f in files:
        im = Image.open(f).convert("RGB")
        if size is None:
            size = im.size
        elif im.size != size:  # mixed sizes: unify on the first image's
            im = im.resize(size, Image.BILINEAR)
        img = np.asarray(im, np.float32) / 255.0
        batch.append(img)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def _stats_for(path: str, feature_fn, batch_size: int):
    """(mu, sigma) for a path of any supported kind."""
    from dmme_tpu.eval.fid import FeatureStats

    if path.endswith(".npz"):
        d = np.load(path)
        return np.asarray(d["mu"], np.float64), np.asarray(d["sigma"], np.float64)

    import jax.numpy as jnp

    stats = None
    for batch in _iter_batches(path, batch_size):
        feats, _ = feature_fn(jnp.asarray(batch))
        if stats is None:
            stats = FeatureStats.create(feats.shape[-1])
        stats = stats.update(feats)
    return stats.moments()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+",
                    help="two paths (FID) or one with --save-stats")
    ap.add_argument("--weights", default=None,
                    help="InceptionV3 weights (.pth or converted .npz)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--save-stats", default=None,
                    help="compute (mu, sigma) of a single path into this .npz")
    args = ap.parse_args(argv)

    from dmme_tpu.eval.fid import frechet_distance
    from dmme_tpu.eval.inception import make_feature_fn

    need_net = not all(p.endswith(".npz") for p in args.paths)
    feature_fn = make_feature_fn(args.weights) if need_net else None
    if args.weights is None and need_net:
        print("# WARNING: no --weights — random Inception; values are NOT "
              "comparable to published FID numbers", file=sys.stderr)

    if args.save_stats:
        assert len(args.paths) == 1, "--save-stats takes exactly one path"
        mu, sigma = _stats_for(args.paths[0], feature_fn, args.batch_size)
        np.savez(args.save_stats, mu=mu, sigma=sigma)
        print(args.save_stats)
        return

    assert len(args.paths) == 2, "need exactly two paths for FID"
    mu1, s1 = _stats_for(args.paths[0], feature_fn, args.batch_size)
    mu2, s2 = _stats_for(args.paths[1], feature_fn, args.batch_size)
    fid = frechet_distance(mu1, s1, mu2, s2)
    if -1e-6 < fid < 0.0:
        fid = 0.0  # roundoff from the eigendecomposition trace
    print(f"FID: {fid:.6f}")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
