"""Synthetic mini-LLVIP dataset builder for tests and CLI smoke drives."""

import os

import numpy as np
from PIL import Image

XML_TEMPLATE = """<annotation>
  <folder>llvip</folder>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""

OBJ_TEMPLATE = """<object>
    <name>{label}</name>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def make_llvip(root, n_train=6, n_test=4, hw=(96, 128), seed=0, boxes_per_img=2):
    """Creates <root>/LLVIP/{visible,infrared}/{train,test}/NNNN.jpg and
    Annotations/NNNN.xml. Returns the LLVIP directory path."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "LLVIP")
    h, w = hw
    for sub in ("visible/train", "visible/test", "infrared/train", "infrared/test",
                "Annotations"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for split, n in (("train", n_train), ("test", n_test)):
        for i in range(n):
            name = f"{split}{i:04d}"
            rgb = rng.randint(0, 255, (h, w, 3), np.uint8)
            ir = rng.randint(0, 255, (h, w), np.uint8)
            objs = []
            for _ in range(boxes_per_img):
                x1 = int(rng.randint(0, w - 20))
                y1 = int(rng.randint(0, h - 20))
                x2 = x1 + int(rng.randint(8, 20))
                y2 = y1 + int(rng.randint(8, 20))
                objs.append(
                    OBJ_TEMPLATE.format(label="person", x1=x1, y1=y1, x2=x2, y2=y2)
                )
            # one non-person + one tiny box that the filters must drop
            objs.append(OBJ_TEMPLATE.format(label="dog", x1=1, y1=1, x2=30, y2=30))
            objs.append(OBJ_TEMPLATE.format(label="person", x1=1, y1=1, x2=3, y2=3))
            xml = XML_TEMPLATE.format(name=name, w=w, h=h, objects="\n".join(objs))
            Image.fromarray(rgb).save(
                os.path.join(base, "visible", split, name + ".jpg")
            )
            Image.fromarray(ir).save(
                os.path.join(base, "infrared", split, name + ".jpg")
            )
            with open(os.path.join(base, "Annotations", name + ".xml"), "w") as f:
                f.write(xml)
    return base + "/"


def make_flir(root, n_train=4, n_test=3, hw=(64, 80), seed=1):
    """Creates the FLIR_aligned layout: JPEGImages/FLIR_xxxxx_{RGB.jpg,
    PreviewData.jpeg}, Annotations/FLIR_xxxxx_PreviewData.xml, and
    align_{train,validation}.txt list files of extension-less PreviewData
    names (the reference's discovery format)."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "FLIR_aligned")
    h, w = hw
    os.makedirs(os.path.join(base, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(base, "Annotations"), exist_ok=True)
    for split, n, listname in (
        ("train", n_train, "align_train.txt"),
        ("test", n_test, "align_validation.txt"),
    ):
        names = []
        for i in range(n):
            name = f"FLIR_{split}{i:05d}_PreviewData"
            stem = name.split("PreviewData")[0]
            rgb = rng.randint(0, 255, (h, w, 3), np.uint8)
            ir = rng.randint(0, 255, (h, w), np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(base, "JPEGImages", stem + "RGB.jpg")
            )
            Image.fromarray(ir).save(
                os.path.join(base, "JPEGImages", name + ".jpeg")
            )
            objs = [
                # big person box: kept in train (area>10) and test (h>50)
                OBJ_TEMPLATE.format(label="person", x1=4, y1=4, x2=30, y2=60),
                # small person: area 9 <= 10 -> dropped in train;
                # height 3 <= 50 -> dropped in test
                OBJ_TEMPLATE.format(label="person", x1=0, y1=0, x2=3, y2=3),
                # person with height 40: kept in train (area 400), dropped in test
                OBJ_TEMPLATE.format(label="person", x1=40, y1=10, x2=50, y2=50),
            ]
            xml = XML_TEMPLATE.format(name=name, w=w, h=h, objects="\n".join(objs))
            with open(os.path.join(base, "Annotations", name + ".xml"), "w") as f:
                f.write(xml)
            names.append(name)
        with open(os.path.join(base, listname), "w") as f:
            f.write("\n".join(names) + "\n")
    return base + "/"


KAIST_OBJ = """<object>
    <name>{label}</name>
    <bndbox><x>{x}</x><y>{y}</y><w>{w}</w><h>{h}</h></bndbox>
  </object>"""


def make_kaist(root, n_train=4, n_test=2, hw=(64, 80), seed=2, empty_every=2):
    """KAIST layout: {train,test}-all-20-{rgb,ir}.txt lists of image paths
    (relative, extension-less), .png images with the .xml annotation next to
    each image, boxes stored as x,y,w,h. Every `empty_every`-th train frame
    has no person boxes (exercises the keep-index filter)."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "kaist")
    h, w = hw
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    for split, n in (("train", n_train), ("test", n_test)):
        rgb_names, ir_names = [], []
        for i in range(n):
            for mod, names in (("rgb", rgb_names), ("ir", ir_names)):
                name = f"images/{split}_{mod}_{i:04d}"
                arr = rng.randint(0, 255, (h, w, 3), np.uint8)
                Image.fromarray(arr).save(os.path.join(base, name + ".png"))
                objs = []
                if not (split == "train" and i % empty_every == 1):
                    objs.append(KAIST_OBJ.format(label="person", x=5, y=5, w=20, h=30))
                objs.append(KAIST_OBJ.format(label="cyclist", x=1, y=1, w=10, h=10))
                xml = XML_TEMPLATE.format(
                    name=name, w=w, h=h, objects="\n".join(objs)
                )
                with open(os.path.join(base, name + ".xml"), "w") as f:
                    f.write(xml)
                names.append(name)
        for mod, names in (("rgb", rgb_names), ("ir", ir_names)):
            with open(os.path.join(base, f"{split}-all-20-{mod}.txt"), "w") as f:
                f.write("\n".join(names) + "\n")
    return base
