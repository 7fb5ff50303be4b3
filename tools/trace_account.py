#!/usr/bin/env python
"""Aggregate an xplane trace into per-pipeline-stage device time.

Reads ONLY the `XLA Ops` line of the TPU plane (other lines — `Steps`,
`XLA Modules` — duplicate the same events and double-count; the XLA Ops
busy-time sums to the program duration, so the device is ~100% busy and the
table is a true decomposition). Categories are regex patterns over the full
HLO text (output + operand shapes), tuned to the HalluciDet product step at
any batch size.

Usage: python tools/trace_account.py <vm.xplane.pb> <n_steps_traced>
"""

import collections
import re
import sys

from xplane_top import walk

B = r"\d+"
PATTERNS = [
    (rf"\[{B},512,7,(75|142|7|256)|\[{B},142,75,256", "roialign"),
    (rf"\[{B},512,(12544|1024)|\[12544,1024|\[{B},512,2,|\[{B},512,4\]|\[{B},512\]",
     "boxhead+sampling"),
    (rf"\[{B},(1000|16875|22665|181320)|1000,1000|\[{B},{B},4096|\[{B},4096",
     "rpn-decode/nms/postproc"),
    (rf"\[{B},(75|38|19|10),(75|38|19|10),|\[{B},150,150|\[{B},37,37|\[{B},5,5",
     "det-backbone+fpn+rpnhead"),
    (rf"\[{B},300,(300|640)|\[{B},256,640,4,2,3|\[300,(256|640)"
     rf"|\[{B},256,640,2,|\[{B},1024,1280,3",
     "resize/handoff"),
    (rf"\[{B},256,320,64|\[{B},128,320,(128|64)\]", "enc-layer1(+fold)"),
    (rf"\[{B},512,640,(4|64|12)\]|\[4,4,(4|12),64|\[{B},1024,1280"
     rf"|\[{B},128,640,(256|16)\]|\[3,4,(16|48),256",  # fold-4 stem (r5)
     "enc-stem/pool/input"),
    (rf"\[{B},128,160,(128|64)", "enc-layer2"),
    (rf"\[{B},64,80,(256|768|128)", "enc-l3+dec-b0"),
    (rf"\[{B},32,40,(512|256)|\[{B},16,20,512", "enc-l4+center"),
    (rf"\[{B},(256|128),640,(128|24|64)", "dec-folded-b3/b4/head"),
    (rf"\[{B},64,160,(128|256)|\[{B},64,320,128", "dec-b1/b2"),
]


def account(path: str, nsteps: int):
    data = open(path, "rb").read()
    for fn, t, v in walk(data):
        if fn != 1 or t != "b":
            continue
        plane = walk(v)
        nm = [x[2] for x in plane if x[0] == 2 and x[1] == "b"]
        if not nm or b"TPU" not in nm[0]:
            continue
        metas = {}
        for f2, t2, v2 in plane:
            if f2 == 4 and t2 == "b":
                for f3, t3, v3 in walk(v2):
                    if f3 == 2 and t3 == "b":
                        m = walk(v3)
                        mid = [x[2] for x in m if x[0] == 1 and x[1] == "i"]
                        name = [
                            x[2].decode("utf8", "replace")
                            for x in m
                            if x[0] == 2 and x[1] == "b"
                        ]
                        if mid:
                            metas[mid[0]] = name[0] if name else ""
        dur = collections.Counter()
        for f2, t2, v2 in plane:
            if f2 == 3 and t2 == "b":
                line = walk(v2)
                lname = [x[2] for x in line if x[0] == 2 and x[1] == "b"]
                if not lname or lname[0] != b"XLA Ops":
                    continue
                for f3, t3, v3 in line:
                    if f3 == 4 and t3 == "b":
                        ev = walk(v3)
                        mid = [x[2] for x in ev if x[0] == 1 and x[1] == "i"]
                        d = [x[2] for x in ev if x[0] == 3 and x[1] == "i"]
                        if mid and d:
                            dur[mid[0]] += d[0]
        cats = collections.Counter()
        unk = collections.Counter()
        for mid, d in dur.items():
            full = metas.get(mid, "")
            for pat, c in PATTERNS:
                if re.search(pat, full):
                    cats[c] += d
                    break
            else:
                cats["other"] += d
                unk[full[:110]] += d
        tot = sum(cats.values())
        print(f"device busy {tot / nsteps / 1e9:.1f} ms/step")
        for c, d in cats.most_common():
            print(f"  {c:28s} {d / nsteps / 1e9:7.2f}")
        print("  top uncategorized:")
        for s, d in unk.most_common(6):
            print(f"   {d / nsteps / 1e9:6.2f}  {s}")
        return


if __name__ == "__main__":
    account(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3)
