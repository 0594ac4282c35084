import sys
sys.path.insert(0,'/tmp/av1p')
exec(open('/tmp/av1p/xcheck.py').read().split("def craft_skip8")[0])
import tile as _t
from tile import Dec, craft_frame

def run(tag, w, h, values):
    st, log = craft_frame(w, h, values)
    d = Dec(st); d.decode_frame()
    mine = bytearray()
    for i in range(h): mine += bytes(d.plane[0][i][:w])
    for p in (1,2):
        for i in range((h+1)//2): mine += bytes(d.plane[p][i][:(w+1)//2])
    r = dav1d_decode(st, w, h)
    if isinstance(r, tuple): print(tag, 'dav1d err', r); return False
    ok = bytes(mine) == r
    print(tag, 'MATCH' if ok else
          'DIFFER  mineY0=%d davY0=%d' % (mine[0], r[0]))
    return ok

# V1: eob-coeff DC with one br: [part,skip,kfy,uv,fi, tsk0?ctx1, eobpt0,
#     beob2, br1, dcsign0, 3 luma tsk=1, 2 chroma tsk=1]
V1 = [0,0,0,0,0, 0, 0, 2, 1, 0, 1,1,1, 1,1]
for exc in (True, False):
    _t.BR_DC_EXC = exc
    run('V1 brDCexc=%s' % exc, 8, 8, V1)
# V2: eob=2: eobcoeff lvl1, DC lvl4(base3+br1): values: tsk0, eobpt=1,
#     beob=0, base=3, br=1, dcsign=0, bool sign? eobcoeff lvl1 pos1: sign bool 0
V2 = [0,0,0,0,0, 0, 1, 0, 3, 1, 0, 0, 1,1,1, 1,1]
for exc in (True, False):
    _t.BR_DC_EXC = exc
    run('V2 brDCexc=%s' % exc, 8, 8, V2)
