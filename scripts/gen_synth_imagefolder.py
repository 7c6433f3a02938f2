"""Generate a synthetic ImageFolder (real JPEGs on disk) for epoch-loop
timing (VERDICT r4 #2).

The reference's published numbers come from a real training program
(``/root/reference/main.py:200-316``: loader workers -> H2D -> step ->
meters -> checkpoint); timing OUR assembled ``main.py`` loop needs real
files so the loader/decode/augment path does real work. Images are
low-frequency random fields (8x8 noise upsampled) so JPEG size and decode
cost resemble natural photos rather than incompressible noise.

Usage: python scripts/gen_synth_imagefolder.py OUT_DIR \
        [--classes 8] [--per-class 1600] [--val-per-class 64] [--size 224]
"""

import argparse
import os

import numpy as np


def write_split(root, split, classes, per_class, size, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    for c in range(classes):
        cdir = os.path.join(root, split, f"class_{c:03d}")
        os.makedirs(cdir, exist_ok=True)
        for i in range(per_class):
            path = os.path.join(cdir, f"img_{i:05d}.jpg")
            if os.path.exists(path):
                continue
            # low-frequency field: 8x8 noise bilinear-upsampled to size
            small = rng.uniform(0, 255, (8, 8, 3)).astype(np.uint8)
            img = Image.fromarray(small).resize(
                (size, size), Image.BILINEAR
            )
            # add a touch of high-frequency texture so decode is honest
            tex = rng.normal(0, 12, (size, size, 3))
            arr = np.clip(np.asarray(img).astype(np.float32) + tex, 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(path, quality=80)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--per-class", type=int, default=1600)
    ap.add_argument("--val-per-class", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()
    write_split(args.out, "train", args.classes, args.per_class,
                args.size, seed=0)
    write_split(args.out, "val", args.classes, args.val_per_class,
                args.size, seed=1)
    n_train = args.classes * args.per_class
    print(f"wrote {n_train} train / "
          f"{args.classes * args.val_per_class} val JPEGs under {args.out}")


if __name__ == "__main__":
    main()
