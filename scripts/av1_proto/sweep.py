"""Amplitude-swept libaom micro-encodings: uniform 16x16 at 128+d."""
import sys, os
sys.path.insert(0, '/root/repo/scripts')
sys.path.insert(0, '/tmp/av1p')
import importlib.util
spec = importlib.util.spec_from_file_location(
    'mkg', '/root/repo/scripts/make_av1_golden.py')
# the script writes goldens on import; patch OUT to /tmp first
import types
src = open('/root/repo/scripts/make_av1_golden.py').read()
# cut the script after the encode/dav1d definitions (before main generation)
cut = src.index('# ------------------------------------------------------------ content')
mod = types.ModuleType('mkg')
mod.__dict__['__file__'] = '/tmp/av1p/mkg.py'
exec(src[:cut], mod.__dict__)
def enc_uniform(w, h, y, u=128, v=128):
    cw, ch = (w+1)//2, (h+1)//2
    yuv = bytes([y])*(w*h) + bytes([u])*(cw*ch) + bytes([v])*(cw*ch)
    return mod.encode(w, h, yuv)
def tile_bytes(obu):
    p = 0
    while p < len(obu):
        hdr = obu[p]; t = (hdr>>3)&0xF; q = p+1
        if (hdr>>1)&1:
            sz = 0; sh = 0
            while True:
                x = obu[q]; q += 1; sz |= (x&0x7F)<<sh; sh += 7
                if not x&0x80: break
        body = obu[q:q+sz]; p = q+sz
        if t == 6: return body[3:]
if __name__ == '__main__':
    import json
    out = {}
    for d in range(0, 80):
        obu = enc_uniform(16, 16, 128+d-40)
        tb = tile_bytes(obu)
        out[d-40] = tb.hex()
    json.dump(out, open('/tmp/sweep16.json','w'))
    for d in (-40, -2, -1, 0, 1, 2, 5, 20, 39):
        print(d, out[d])
