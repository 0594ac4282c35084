import sys, ctypes
sys.path.insert(0,'/tmp/av1p')
exec(open('/tmp/av1p/xcheck.py').read().split("def craft_skip8")[0])
import tile as _t
from tile import Dec, craft_frame

def dav1d_mono(st, w, h):
    stv = ctypes.create_string_buffer(256)
    DAV.dav1d_default_settings(stv)
    ctxp = ctypes.c_void_p(None)
    assert DAV.dav1d_open(ctypes.byref(ctxp), stv) == 0
    data = ctypes.create_string_buffer(128)
    payload = ctypes.create_string_buffer(bytes(st), len(st))
    assert DAV.dav1d_data_wrap(data, payload, len(st), _free_cb, None) == 0
    if DAV.dav1d_send_data(ctxp, data) != 0: return None
    pic = ctypes.create_string_buffer(512)
    rc = DAV.dav1d_get_picture(ctxp, pic)
    if rc != 0: rc = DAV.dav1d_get_picture(ctxp, pic)
    if rc != 0: return None
    raw = pic.raw
    datap = int.from_bytes(raw[16:24], 'little')
    stride = int.from_bytes(raw[40:48], 'little')
    y = b''.join(ctypes.string_at(datap + r*stride, w) for r in range(h))
    DAV.dav1d_close(ctypes.byref(ctxp))
    return y

def runm(values, w=8, h=8):
    st, log = craft_frame(w, h, values, seq_kw={'mono':1})
    d = Dec(st); d.decode_frame()
    mine = bytes(b for i in range(h) for b in d.plane[0][i][:w])
    r = dav1d_mono(st, w, h)
    return mine == r, mine, r

# block3-signal skeleton: SPLIT + 3 skipped 4x4s + probe block
PRE = [3, 1,0,0, 1,0,0, 1,0,0, 0,0,0]
