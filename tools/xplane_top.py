import sys, collections
def varint(buf, i):
    x = 0; s = 0
    while True:
        b = buf[i]; i += 1
        x |= (b & 0x7f) << s
        if not b & 0x80: return x, i
        s += 7
def walk(buf):
    i = 0; out = []
    while i < len(buf):
        try: tag, i = varint(buf, i)
        except Exception: return None
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = varint(buf, i); out.append((fn, 'i', v))
        elif wt == 2:
            ln, i = varint(buf, i)
            if i + ln > len(buf): return None
            out.append((fn, 'b', buf[i:i+ln])); i += ln
        elif wt == 5: out.append((fn, 'f', buf[i:i+4])); i += 4
        elif wt == 1: out.append((fn, 'd', buf[i:i+8])); i += 8
        else: return None
    return out

def top_ops(path, n=30, substr=None):
    data = open(path, "rb").read()
    top = walk(data)
    for fn, t, v in top:
        if fn != 1 or t != 'b': continue
        plane = walk(v)
        nm = [x[2] for x in plane if x[0] == 2 and x[1] == 'b']
        if not nm or b"TPU" not in nm[0]: continue
        metas = {}
        for f2, t2, v2 in plane:
            if f2 == 4 and t2 == 'b':
                kv = walk(v2)
                for f3, t3, v3 in kv:
                    if f3 == 2 and t3 == 'b':
                        m = walk(v3)
                        mid = [x[2] for x in m if x[0] == 1 and x[1] == 'i']
                        name = [x[2].decode('utf8', 'replace') for x in m if x[0] == 2 and x[1] == 'b']
                        disp = [x[2].decode('utf8', 'replace') for x in m if x[0] == 4 and x[1] == 'b']
                        if mid:
                            metas[mid[0]] = (disp[0] if disp else "", name[0] if name else "")
        dur = collections.Counter(); cnt = collections.Counter()
        for f2, t2, v2 in plane:
            if f2 == 3 and t2 == 'b':
                line = walk(v2)
                for f3, t3, v3 in line:
                    if f3 == 4 and t3 == 'b':
                        ev = walk(v3)
                        mid = [x[2] for x in ev if x[0] == 1 and x[1] == 'i']
                        d = [x[2] for x in ev if x[0] == 3 and x[1] == 'i']
                        if mid and d:
                            dur[mid[0]] += d[0]; cnt[mid[0]] += 1
        total = sum(dur.values())
        print(f"PLANE {nm[0].decode()}  total {total/1e9:.2f}ms")
        for mid, d in dur.most_common(n):
            disp, full = metas.get(mid, ("?", "?"))
            if substr and substr not in full: continue
            print(f"{d/1e9:8.2f}ms x{cnt[mid]:3d}  {disp:28s} {full[:170]}")
        return

if __name__ == "__main__":
    top_ops(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
