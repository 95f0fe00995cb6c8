"""Build the DDRNet-human csv index — parity with
RDF-GAN/lib/dataset/ddrnet_human/createcsv.py: each row is
``color_map,depth_map,high_quality_depth,mask`` absolute paths, one row per
image found under ``<input>/color_map/``.

Usage: python tools/create_ddrnet_csv.py <input_dir> <output_csv>
"""

from __future__ import annotations

import os
import os.path as osp
import sys


def write_index(input_dir: str, output_csv: str):
    path = osp.abspath(input_dir)
    images = sorted(os.listdir(osp.join(path, "color_map")))
    with open(output_csv, "a") as fout:
        for image in images:
            row = [osp.join(path, sub, image)
                   for sub in ("color_map", "depth_map",
                               "high_quality_depth", "mask")]
            fout.write(",".join(row) + "\n")
    return len(images)


if __name__ == "__main__":
    n = write_index(sys.argv[1], sys.argv[2])
    print(f"indexed {n} images -> {sys.argv[2]}")
