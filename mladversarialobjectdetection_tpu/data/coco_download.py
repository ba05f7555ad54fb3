"""Async COCO person-category downloader.

Behavioral parity with reference coco_dl_by_category.py:23-91: build the
person-image index from COCO instance annotations, download images over a
bounded aiohttp connection pool, and write one label txt per image with
lines `0 ymin xmin ymax xmax`.

Difference: the annotation JSON is parsed with the stdlib instead of
pycocotools (not available in this environment), removing the dependency.
"""
from __future__ import annotations

import asyncio
import json
import os

from ..utils.log import get_logger

logger = get_logger(__name__)

PERSON_CATEGORY_ID = 1
MAX_CONNECTIONS = 50


def person_index(annotation_file: str) -> dict:
    """image_id -> {'file_name', 'coco_url', 'boxes': [(ymin,xmin,ymax,xmax)]}"""
    with open(annotation_file) as f:
        coco = json.load(f)
    images = {im["id"]: {"file_name": im["file_name"],
                         "coco_url": im.get("coco_url"),
                         "boxes": []}
              for im in coco["images"]}
    for ann in coco["annotations"]:
        if ann["category_id"] != PERSON_CATEGORY_ID or ann.get("iscrowd"):
            continue
        x, y, w, h = ann["bbox"]
        entry = images.get(ann["image_id"])
        if entry is not None:
            entry["boxes"].append((y, x, y + h, x + w))
    return {k: v for k, v in images.items() if v["boxes"]}


def write_label(label_dir: str, file_name: str, boxes) -> None:
    stem = os.path.splitext(file_name)[0]
    with open(os.path.join(label_dir, stem + ".txt"), "w") as f:
        for ymin, xmin, ymax, xmax in boxes:
            f.write(f"0 {ymin} {xmin} {ymax} {xmax}\n")


async def _download_one(session, sem, url: str, dest: str) -> bool:
    async with sem:
        try:
            async with session.get(url) as resp:
                if resp.status != 200:
                    return False
                data = await resp.read()
            with open(dest, "wb") as f:
                f.write(data)
            return True
        except Exception as e:  # noqa: BLE001 - best-effort downloader
            logger.warning(f"failed {url}: {e}")
            return False


async def download_async(index: dict, img_dir: str, label_dir: str,
                         limit: int | None = None) -> int:
    import aiohttp
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(label_dir, exist_ok=True)
    sem = asyncio.Semaphore(MAX_CONNECTIONS)
    n_ok = 0
    items = list(index.values())[:limit]
    async with aiohttp.ClientSession() as session:
        tasks = []
        for entry in items:
            dest = os.path.join(img_dir, entry["file_name"])
            if os.path.exists(dest) or not entry["coco_url"]:
                continue
            tasks.append(_download_one(session, sem, entry["coco_url"], dest))
        results = await asyncio.gather(*tasks)
        n_ok = sum(results)
    for entry in items:
        if os.path.exists(os.path.join(img_dir, entry["file_name"])):
            write_label(label_dir, entry["file_name"], entry["boxes"])
    return n_ok


def main(annotation_file: str, img_dir: str = "downloaded_images",
         label_dir: str = "labels", limit: int | None = None) -> int:
    index = person_index(annotation_file)
    logger.info(f"{len(index)} person images in index")
    return asyncio.run(download_async(index, img_dir, label_dir, limit))


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", required=True,
                   help="COCO instances_*.json")
    p.add_argument("--img-dir", default="downloaded_images")
    p.add_argument("--label-dir", default="labels")
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args()
    main(a.annotations, a.img_dir, a.label_dir, a.limit)
