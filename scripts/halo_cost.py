"""Analytic spatial-axis (H-sharding) communication cost per train step.

The ``spatial`` mesh axis is correctness-tested (sharded == single-device,
tests/test_parallel*.py) but its COST cannot be measured on 1 chip — this
script computes it instead, so a multi-chip operator can predict when
spatial sharding beats pure data parallelism (docs/parallelism.md).

Model: the DDPM/ADM UNet layer list (models/unet.py construction rules).
Per 3x3 conv with H sharded S-ways, every interior boundary exchanges one
halo row each way: per-device traffic = 2 rows x W x C_in x bytes (forward)
and the same again for the backward's input-gradient halo, x2.
GroupNorm statistics are a per-(sample, group) scalar pair all-reduce —
negligible but counted. Global attention at an H-sharded depth all-gathers
K and V (2 x (H/S)(S-1)/S x W x C received per device, ~2·H·W·C for large S)
plus the same for the backward — by far the dominant term where it fires.

Usage: python scripts/halo_cost.py [--img 256] [--batch 2] [--spatial 2 4 8]
"""

import argparse


def unet_layout(img, channels=(128, 128, 256, 256, 512, 512), num_blocks=2,
                attention_depths=(5,)):
    """Yield (resolution, C_in, C_out, kind) for every 3x3-conv site on the
    down path, middle, and up path — mirroring models/unet.py's layer list
    (2 convs per ResBlock; stride-2 conv per DownSample; conv per UpSample;
    skip-concat doubles C_in of up-path block 1)."""
    sites = []
    res = img
    depth_res = {}
    prev = channels[0]
    sites.append((res, 3, channels[0], "stem"))
    for d, ch in enumerate(channels, start=1):
        depth_res[d] = res
        for _ in range(num_blocks):
            sites.append((res, prev, ch, "res"))
            sites.append((res, ch, ch, "res"))
            if d in attention_depths:
                sites.append((res, ch, ch, "attn"))
            prev = ch
        if d != len(channels):
            sites.append((res, ch, ch, "down"))
            res //= 2
    # middle: res + attn + res
    sites += [(res, prev, prev, "res"), (res, prev, prev, "res"),
              (res, prev, prev, "attn"),
              (res, prev, prev, "res"), (res, prev, prev, "res")]
    # up path
    for d, ch in reversed(list(enumerate(channels, start=1))):
        res = depth_res[d]
        for b in range(num_blocks + 1):
            cin = prev + ch  # skip concat
            sites.append((res, cin, ch, "res"))
            sites.append((res, ch, ch, "res"))
            if d in attention_depths:
                sites.append((res, ch, ch, "attn"))
            prev = ch
        if d != 1:
            sites.append((res, ch, ch, "up"))
    return sites


def cost(sites, batch, spatial, bytes_per=2):
    """Per-DEVICE bytes moved per train step (fwd + bwd) at S-way H-sharding."""
    halo = attn = 0
    for res, cin, cout, kind in sites:
        if kind == "attn":
            # all-gather K,V (+ same pattern in backward): ~2 x 2 x H*W*C
            attn += 4 * res * res * cout * bytes_per * batch
            continue
        w = res  # square images
        # fwd: 2 halo rows of (W, C_in); bwd dgrad: 2 halo rows of (W, C_out)
        halo += 2 * w * cin * bytes_per * batch
        halo += 2 * w * cout * bytes_per * batch
    return halo, attn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--spatial", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="per-link ICI bandwidth, GB/s each way (v5e: ~45)")
    args = ap.parse_args()

    sites = unet_layout(args.img)
    n_attn = sum(1 for s in sites if s[3] == "attn")
    print(f"# LSUN/ADM-class UNet at {args.img}px, per-device batch "
          f"{args.batch}, bf16: {len(sites) - n_attn} conv sites, "
          f"{n_attn} global-attention sites")
    print(f"{'S':>3} {'halo MB/step':>14} {'attn MB/step':>14} "
          f"{'total MB/step':>14} {'ICI ms/step':>12}")
    for s in args.spatial:
        halo, attn = cost(sites, args.batch, s)
        total = halo + attn
        ms = total / (args.ici_gbps * 1e9) * 1e3
        print(f"{s:>3} {halo / 1e6:>14.1f} {attn / 1e6:>14.1f} "
              f"{total / 1e6:>14.1f} {ms:>12.2f}")
    print("# halo term is S-independent per device (1 row per boundary); "
          "attention all-gather ≈ full H·W·C regardless of S")


if __name__ == "__main__":
    main()
