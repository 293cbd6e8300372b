"""``ds-download-data``: dataset fetch helper.

Counterpart of the reference downloader (reference:
scripts/download_data.py:30-135): same dataset URL table, plus the
per-dataset devices.yaml the loaders need. Uses urllib + tar/zip extraction
instead of gdown/wget.
"""
from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request
import zipfile

# reference: scripts/download_data.py:30-60 slam_downloads
DATASETS = {
    "replica": {
        "url": "https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip",
        "note": "Replica 8-scene RGB-D renders (NICE-SLAM packaging)",
    },
    "replica-apartment": {
        "url": "https://cvg-data.inf.ethz.ch/nice-slam/data/Apartment.zip",
        "note": "Replica apartment sequence",
    },
    "tum": {
        "url": "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz",
        "note": "TUM RGB-D fr1/desk (fetch other sequences analogously)",
    },
    "cofusion": {
        "url": "https://cvg-data.inf.ethz.ch/nice-slam/data/CoFusion.zip",
        "note": "CoFusion synthetic sequences",
    },
    "euroc-mh01": {
        "url": "http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_01_easy/MH_01_easy.zip",
        "note": "EuRoC MAV MH_01_easy",
    },
    "7scenes-office": {
        "url": "http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8/office.zip",
        "note": "7-Scenes office",
    },
}

DEVICE_YAMLS = {
    "replica": {"cam": {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0, "cx": 599.5, "cy": 339.5, "png_depth_scale": 6553.5, "downsample_factor": 1}},
    "tum": {"cam": {"H": 480, "W": 640, "fx": 517.3, "fy": 516.5, "cx": 318.6, "cy": 255.3, "png_depth_scale": 5000.0, "crop_edge": 8, "distortion": [0.2624, -0.9531, -0.0054, 0.0026, 1.1633]}},
}


def download(name: str, out_dir: str) -> None:
    info = DATASETS[name]
    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, os.path.basename(info["url"]))
    if not os.path.exists(fname):
        print(f"downloading {info['url']} -> {fname}")
        urllib.request.urlretrieve(info["url"], fname)
    print(f"extracting {fname}")
    if fname.endswith(".zip"):
        with zipfile.ZipFile(fname) as z:
            z.extractall(out_dir)
    elif fname.endswith((".tgz", ".tar.gz")):
        with tarfile.open(fname) as t:
            t.extractall(out_dir)
    base = name.split("-")[0]
    if base in DEVICE_YAMLS:
        import yaml

        for root, dirs, files in os.walk(out_dir):
            if "devices.yaml" not in files and ("results" in dirs or "rgb.txt" in files):
                with open(os.path.join(root, "devices.yaml"), "w") as f:
                    yaml.safe_dump(DEVICE_YAMLS[base], f)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="ds-download-data")
    p.add_argument("dataset", choices=sorted(DATASETS) + ["list"])
    p.add_argument("--out-dir", default="data")
    args = p.parse_args(argv)
    if args.dataset == "list":
        for k, v in DATASETS.items():
            print(f"{k:20s} {v['note']}")
        return
    download(args.dataset, args.out_dir)


def entrypoint() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
