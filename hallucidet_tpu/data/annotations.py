"""VOC-style XML annotation parsing with the reference's dataset filters.

Rebuild of `Utils.get_bbox` (reference: src/utils/utils.py:342-438):
- LLVIP: annotation lives under <root>/LLVIP/Annotations/<name>.xml
- FLIR: under <root>/Annotations/, RGB names remapped to PreviewData
- KAIST: xml next to the image, boxes stored as x,y,w,h
Filters: person-only; LLVIP/KAIST keep area > 5; FLIR train keeps area > 10,
FLIR test keeps height > 50 (external eval convention the reference adopted).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict

import numpy as np


def _annotation_path(filename: str, dataset: str) -> str:
    if dataset == "llvip":
        root = filename[: filename.index("LLVIP")]
        return os.path.join(root, "LLVIP", "Annotations", os.path.basename(filename))
    if dataset == "flir":
        base = filename.split("/JPEGImages/")
        return os.path.join(base[0], "Annotations", base[-1]).replace(
            "RGB", "PreviewData"
        )
    if dataset == "kaist":
        return filename
    raise ValueError(f"Dataset not supported: {dataset}")


def get_bbox(filename: str, dataset: str = "kaist", train: bool = False) -> Dict:
    """Parse one annotation file -> {'bboxes': [N,4] float xyxy, 'labels':
    [N,1] int} with the reference's per-dataset filters applied."""
    path = _annotation_path(filename, dataset)
    root = ET.parse(path).getroot()

    keys = ["x", "y", "w", "h"] if dataset == "kaist" else ["xmin", "ymin", "xmax", "ymax"]
    bboxes, labels = [], []
    for obj in root.findall("object"):
        bnd = obj.find("bndbox")
        vals = [int(bnd.find(k).text) for k in keys]
        if dataset == "kaist":
            vals[2] += vals[0]
            vals[3] += vals[1]
        x1, y1 = min(vals[0], vals[2]), min(vals[1], vals[3])
        x2, y2 = max(vals[0], vals[2]), max(vals[1], vals[3])
        name = obj.find("name").text
        if dataset == "flir":
            if train:
                if abs(x2 - x1) * abs(y2 - y1) > 10.0 and name == "person":
                    bboxes.append([x1, y1, x2, y2])
                    labels.append([1])
            elif abs(y2 - y1) > 50.0 and name == "person":
                bboxes.append([x1, y1, x2, y2])
                labels.append([1])
        elif abs(x2 - x1) * abs(y2 - y1) > 5.0 and name == "person":
            bboxes.append([x1, y1, x2, y2])
            labels.append([1])

    return {
        "bboxes": np.array(bboxes, dtype="float").reshape(-1, 4),
        "labels": np.array(labels, dtype="int").reshape(-1, 1),
    }
