#!/usr/bin/env python3
"""Golden AV1 keyframe fixtures from the system libaom encoder,
cross-validated by the system libdav1d decoder (public C ABIs via
ctypes) — the two-validator convention that gated the VP8 work
(libwebp encode -> our decode) now with INDEPENDENT encoder and
decoder codebases.

Phase 1 scope: LOSSLESS 4:2:0 8-bit keyframes (rc_min_quantizer =
rc_max_quantizer = 0 -> base_q_idx 0, no delta-q -> CodedLossless per
spec -> deblocking/CDEF/loop-restoration all OFF, every transform the
4x4 WHT).  The golden YUV is dav1d's reconstruction, which for
lossless must equal the encoder input exactly — both facts are
asserted here, so a committed golden carries its own proof.

Writes data/av1_golden/<name>.obu (the raw temporal unit from the
encoder), <name>.yuv (Y then U then V, stride removed) and index.txt
of name,width,height rows.

Deterministic (fixed LCG); rerunnable.
"""
import ctypes, os, sys

AOM = ctypes.CDLL("libaom.so.3")
DAV = ctypes.CDLL("libdav1d.so.6")

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "av1_golden")
os.makedirs(OUT, exist_ok=True)

# ---------------------------------------------------------------- aom
AOM.aom_codec_av1_cx.restype = ctypes.c_void_p
AOM.aom_codec_enc_config_default.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint]
AOM.aom_codec_enc_config_default.restype = ctypes.c_int
AOM.aom_codec_enc_init_ver.argtypes = [
    ctypes.c_char_p, ctypes.c_void_p, ctypes.c_char_p,
    ctypes.c_long, ctypes.c_int]
AOM.aom_codec_enc_init_ver.restype = ctypes.c_int
AOM.aom_img_wrap.restype = ctypes.c_void_p
AOM.aom_img_wrap.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_uint, ctypes.c_uint,
    ctypes.c_uint, ctypes.c_char_p]
AOM.aom_codec_encode.argtypes = [
    ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_ulong,
    ctypes.c_long]
AOM.aom_codec_encode.restype = ctypes.c_int
AOM.aom_codec_get_cx_data.restype = ctypes.c_void_p
AOM.aom_codec_get_cx_data.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
AOM.aom_codec_error.restype = ctypes.c_char_p
AOM.aom_codec_error.argtypes = [ctypes.c_char_p]

AOM_IMG_FMT_I420 = 0x102


def enc_cfg(w, h):
    """aom_codec_enc_cfg_t filled by the library itself; we poke only
    anchored fields (offsets verified against the defaults the library
    just wrote — a wrong offset trips the anchor assert, not UB)."""
    cfg = ctypes.create_string_buffer(16384)
    iface = ctypes.c_void_p(AOM.aom_codec_av1_cx())
    rc = AOM.aom_codec_enc_config_default(iface, cfg, 0)
    assert rc == 0, rc
    u32 = lambda off: int.from_bytes(cfg.raw[off:off + 4], "little")

    def put32(off, v):
        ctypes.memmove(ctypes.byref(cfg, off), v.to_bytes(4, "little"), 4)

    # anchors: the public header's documented defaults for usage 0
    assert u32(0) == 0, "g_usage"
    assert u32(32) == 8, ("g_bit_depth", u32(32))
    assert u32(36) == 8, ("g_input_bit_depth", u32(36))
    assert u32(40) == 1 and u32(44) == 30, ("g_timebase", u32(40), u32(44))
    assert u32(144) == 63, ("rc_max_quantizer", u32(144))
    assert u32(140) == 0, ("rc_min_quantizer", u32(140))
    put32(12, w)      # g_w
    put32(16, h)      # g_h
    put32(20, 1)      # g_limit: single frame
    put32(56, 0)      # g_lag_in_frames: no lookahead
    put32(144, 0)     # rc_max_quantizer = 0 -> base_q_idx 0 -> lossless
    return cfg, iface


def find_abi_ver():
    """the init-version handshake rejects a wrong ABI version before
    touching anything else — probe it rather than hardcode"""
    cfg, iface = enc_cfg(64, 64)
    for ver in range(64):
        ctx = ctypes.create_string_buffer(512)
        rc = AOM.aom_codec_enc_init_ver(ctx, iface, cfg, 0, ver)
        if rc == 0:
            return ver
    raise SystemExit("no working AOM_ENCODER_ABI_VERSION found")


ABI = find_abi_ver()


AOM.aom_codec_control.restype = ctypes.c_int
# AV1E_SET_TILE_COLUMNS / AV1E_SET_TILE_ROWS: located by a subprocess
# sweep of the control-id space (value-anchored below — applying the
# column control to a 2-superblock-wide frame must flip the frame
# header's tile_cols_log2 bit, asserted per golden by the prototype
# parser replay in scripts/av1_proto)
AV1E_SET_TILE_COLUMNS = 33
AV1E_SET_TILE_ROWS = 34


def encode(w, h, yuv, tile_cols_log2=0, tile_rows_log2=0):
    cfg, iface = enc_cfg(w, h)
    ctx = ctypes.create_string_buffer(512)
    rc = AOM.aom_codec_enc_init_ver(ctx, iface, cfg, 0, ABI)
    assert rc == 0, rc
    if tile_cols_log2:
        assert AOM.aom_codec_control(
            ctx, AV1E_SET_TILE_COLUMNS, ctypes.c_int(tile_cols_log2)) == 0
    if tile_rows_log2:
        assert AOM.aom_codec_control(
            ctx, AV1E_SET_TILE_ROWS, ctypes.c_int(tile_rows_log2)) == 0
    img = ctypes.create_string_buffer(512)
    buf = ctypes.create_string_buffer(bytes(yuv), len(yuv))
    assert AOM.aom_img_wrap(img, AOM_IMG_FMT_I420, w, h, 1, buf)
    rc = AOM.aom_codec_encode(ctx, img, 0, 1, 0)
    assert rc == 0, (rc, AOM.aom_codec_error(ctx))
    out = b""
    it = ctypes.c_void_p(None)
    while True:
        pkt = AOM.aom_codec_get_cx_data(ctx, ctypes.byref(it))
        if not pkt:
            break
        kind = int.from_bytes(ctypes.string_at(pkt, 4), "little")
        if kind == 0:  # AOM_CODEC_CX_FRAME_PKT
            p = ctypes.string_at(pkt + 8, 16)
            bufp = int.from_bytes(p[0:8], "little")
            sz = int.from_bytes(p[8:16], "little")
            out += ctypes.string_at(bufp, sz)
    # flush
    rc = AOM.aom_codec_encode(ctx, None, 0, 1, 0)
    assert rc == 0
    it = ctypes.c_void_p(None)
    while True:
        pkt = AOM.aom_codec_get_cx_data(ctx, ctypes.byref(it))
        if not pkt:
            break
        kind = int.from_bytes(ctypes.string_at(pkt, 4), "little")
        if kind == 0:
            p = ctypes.string_at(pkt + 8, 16)
            bufp = int.from_bytes(p[0:8], "little")
            sz = int.from_bytes(p[8:16], "little")
            out += ctypes.string_at(bufp, sz)
    assert out, "no encoded frame"
    return out


# -------------------------------------------------------------- dav1d
DAV.dav1d_default_settings.argtypes = [ctypes.c_char_p]
DAV.dav1d_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
DAV.dav1d_open.restype = ctypes.c_int
DAV.dav1d_data_wrap.restype = ctypes.c_int
FREECB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p)
_free_cb = FREECB(lambda a, b: None)
DAV.dav1d_data_wrap.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t, FREECB,
    ctypes.c_void_p]
DAV.dav1d_send_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
DAV.dav1d_send_data.restype = ctypes.c_int
DAV.dav1d_get_picture.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
DAV.dav1d_get_picture.restype = ctypes.c_int


def dav1d_decode(obu, w, h):
    st = ctypes.create_string_buffer(256)
    DAV.dav1d_default_settings(st)
    ctxp = ctypes.c_void_p(None)
    rc = DAV.dav1d_open(ctypes.byref(ctxp), st)
    assert rc == 0, rc
    data = ctypes.create_string_buffer(128)
    payload = ctypes.create_string_buffer(bytes(obu), len(obu))
    rc = DAV.dav1d_data_wrap(data, payload, len(obu), _free_cb, None)
    assert rc == 0, rc
    rc = DAV.dav1d_send_data(ctxp, data)
    assert rc == 0, rc
    pic = ctypes.create_string_buffer(512)
    rc = DAV.dav1d_get_picture(ctxp, pic)
    if rc != 0:  # EAGAIN: drain after signalling EOS by resending
        rc = DAV.dav1d_get_picture(ctxp, pic)
    assert rc == 0, rc
    raw = pic.raw
    datap = [int.from_bytes(raw[16 + 8 * i:24 + 8 * i], "little")
             for i in range(3)]
    stride = [int.from_bytes(raw[40 + 8 * i:48 + 8 * i], "little")
              for i in range(2)]
    pw = int.from_bytes(raw[56:60], "little")
    ph = int.from_bytes(raw[60:64], "little")
    layout = int.from_bytes(raw[64:68], "little")
    bpc = int.from_bytes(raw[68:72], "little")
    assert (pw, ph) == (w, h), (pw, ph, w, h)
    assert layout == 1 and bpc == 8, (layout, bpc)  # I420, 8-bit
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = b"".join(ctypes.string_at(datap[0] + r * stride[0], w)
                 for r in range(h))
    u = b"".join(ctypes.string_at(datap[1] + r * stride[1], cw)
                 for r in range(ch))
    v = b"".join(ctypes.string_at(datap[2] + r * stride[1], cw)
                 for r in range(ch))
    DAV.dav1d_close(ctypes.byref(ctxp))
    return y + u + v


# ------------------------------------------------------------ content
def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (1103515245 * s + 12345) & 0x7FFFFFFF
        yield s


def plane(w, h, f):
    return bytes(f(x, y) for y in range(h) for x in range(w))


def i420(w, h, fy, fu, fv):
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return plane(w, h, fy) + plane(cw, ch, fu) + plane(cw, ch, fv)


def gradient(w, h, seed):
    return i420(w, h,
                lambda x, y: (x * 255 // max(1, w - 1) +
                              y * 200 // max(1, h - 1)) // 2,
                lambda x, y: 100 + x % 56, lambda x, y: 80 + y % 96)


def noisy(w, h, seed):
    g = lcg(seed)
    n = w * h + 2 * (((w + 1) // 2) * ((h + 1) // 2))
    return bytes(next(g) & 255 for _ in range(n))


def smooth_noise(w, h, seed):
    # band-limited: noise at 8-px lattice, bilinear between — gives
    # the encoder real mode decisions (smooth/directional/paeth win)
    g = lcg(seed)
    gw, gh = w // 8 + 2, h // 8 + 2
    lat = [[next(g) & 255 for _ in range(gw)] for _ in range(gh)]

    def f(x, y):
        gx, gy = x / 8.0, y / 8.0
        x0, y0 = int(gx), int(gy)
        fx, fy = gx - x0, gy - y0
        a = lat[y0][x0] * (1 - fx) + lat[y0][x0 + 1] * fx
        b = lat[y0 + 1][x0] * (1 - fx) + lat[y0 + 1][x0 + 1] * fx
        return int(a * (1 - fy) + b * fy) & 255
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return (plane(w, h, f) +
            plane(cw, ch, lambda x, y: f(2 * x, 2 * y) // 2 + 64) +
            plane(cw, ch, lambda x, y: 255 - f(2 * x, 2 * y) // 2))


def edges(w, h, seed):
    g = lcg(seed)
    cols = [next(g) & 255 for _ in range(16)]

    def f(x, y):
        return cols[((x // 16) + 5 * (y // 16)) % 16]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return (plane(w, h, f) +
            plane(cw, ch, lambda x, y: f(2 * x, 2 * y)) +
            plane(cw, ch, lambda x, y: 255 - f(2 * x, 2 * y)))


CASES = [
    ("flat64", 64, 64, lambda w, h: i420(w, h, lambda x, y: 93,
                                         lambda x, y: 140, lambda x, y: 200)),
    ("grad64", 64, 64, lambda w, h: gradient(w, h, 1)),
    ("smooth64", 64, 64, lambda w, h: smooth_noise(w, h, 7)),
    ("noise64", 64, 64, lambda w, h: noisy(w, h, 3)),
    ("edges64", 64, 64, lambda w, h: edges(w, h, 5)),
    ("grad128x64", 128, 64, lambda w, h: gradient(w, h, 9)),
    ("smooth96", 96, 96, lambda w, h: smooth_noise(w, h, 11)),
    ("odd52x36", 52, 36, lambda w, h: smooth_noise(w, h, 13)),
    # truly-odd dims are NOT lossless through libaom's I420 input
    # path (probe: every odd w or h DIFFs, every even dim is EXACT)
    # — odd-dim decode paths are covered by the test-side fixture
    # writer instead, where we control the bitstream
    ("odd50x34", 50, 34, lambda w, h: gradient(w, h, 15)),
    ("tiny8", 8, 8, lambda w, h: gradient(w, h, 19)),
    ("tiny16", 16, 16, lambda w, h: smooth_noise(w, h, 21)),
    ("smooth160x80", 160, 80, lambda w, h: smooth_noise(w, h, 17)),
    # multi-tile frames (round 15): uniform 2x1 and 2x2 tile grids —
    # per-tile MSAC instances, per-tile CDF/context resets, the
    # tile_size_minus_1 framing, and tile-bounded intra availability
    ("tiles256x128", 256, 128, lambda w, h: smooth_noise(w, h, 23), 1, 0),
    ("tiles256x256", 256, 256, lambda w, h: smooth_noise(w, h, 29), 1, 1),
]

if __name__ == "__main__":
    index = []
    for case in CASES:
        name, w, h, gen = case[:4]
        tcl, trl = (case[4], case[5]) if len(case) > 4 else (0, 0)
        src = gen(w, h)
        obu = encode(w, h, src, tcl, trl)
        rec = dav1d_decode(obu, w, h)
        match = "EXACT" if rec == src else "DIFF"
        # lossless: dav1d's reconstruction must equal the input —
        # this is what makes the committed golden self-proving
        print(f"{name}: {w}x{h} obu={len(obu)}B dav1d={match}")
        assert rec == src, f"{name}: lossless encode not lossless!"
        open(os.path.join(OUT, name + ".obu"), "wb").write(obu)
        open(os.path.join(OUT, name + ".yuv"), "wb").write(rec)
        index.append(f"{name},{w},{h}")
    open(os.path.join(OUT, "index.txt"), "w").write("\n".join(index) + "\n")
    print(f"wrote {len(CASES)} goldens to {OUT}")
