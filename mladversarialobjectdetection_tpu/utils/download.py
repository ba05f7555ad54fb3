"""Pretrained-checkpoint download helpers.

Behavioral parity with reference util.py:76-88: fetch the official
`<model>.tgz` from the cloud-tpu-checkpoints GCS bucket and untar it. The
result feeds ckpt/convert_tf.py to produce native Flax checkpoints.
"""
from __future__ import annotations

import os
import tarfile
import urllib.request

from .log import get_logger

logger = get_logger(__name__)

GCS_URL = ("https://storage.googleapis.com/cloud-tpu-checkpoints/"
           "efficientdet/coco/{model}.tgz")


def download(model_name: str, dest_dir: str = ".") -> str:
    """Download + extract an official EfficientDet checkpoint.

    Returns the extracted checkpoint directory path."""
    out_dir = os.path.join(dest_dir, model_name)
    if os.path.isdir(out_dir):
        logger.info(f"{out_dir} already present")
        return out_dir
    url = GCS_URL.format(model=model_name)
    tgz = os.path.join(dest_dir, f"{model_name}.tgz")
    logger.info(f"downloading {url}")
    urllib.request.urlretrieve(url, tgz)
    with tarfile.open(tgz) as tar:
        tar.extractall(dest_dir)
    os.remove(tgz)
    return out_dir


def ensure_empty_dir(path: str) -> str:
    """Create-or-clear a directory (util.py:90-101)."""
    import shutil
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path)
    return path
