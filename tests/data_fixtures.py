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
