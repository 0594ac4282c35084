#!/usr/bin/env python3
"""Golden lossy-VP8 (WebP) fixtures from the system's own libwebp
(public C ABI via ctypes) — the in-environment-validator convention
(JDK charsets, zstd-jni, the VP8L goldens): real encoder output
exercises segmentation, per-segment quantizers, token probability
updates and the normal loop filter the Scala decoder must reproduce.

The golden is libwebp's own WebPDecodeYUV output — the raw
reconstructed Y/U/V planes with NO colorspace conversion or
upsampling, i.e. exactly the VP8 decoder state after the loop filter.

Writes data/vp8_golden/<name>.webp and <name>.yuv (Y plane w*h bytes,
then U then V at ceil(w/2)*ceil(h/2) each, row-major, stride removed)
plus an index.txt of name,width,height,quality rows.

Deterministic (fixed LCG; no RNG module), rerunnable.
"""
import ctypes, os

LW = ctypes.CDLL("libwebp.so.7")
LW.WebPEncodeRGBA.restype = ctypes.c_size_t
LW.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LW.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LW.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "vp8_golden")
os.makedirs(OUT, exist_ok=True)


def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (1103515245 * s + 12345) & 0x7FFFFFFF
        yield s


def gradient(w, h, seed):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = (x * 255 // max(1, w - 1))
            gg = (y * 255 // max(1, h - 1))
            b = (x + y) % 256
            px += bytes((r, gg, b, 255))
    return bytes(px)


def noisy(w, h, seed):
    g = lcg(seed)
    px = bytearray()
    for _ in range(w * h):
        v = next(g)
        px += bytes((v & 255, (v >> 8) & 255, (v >> 16) & 255, 255))
    return bytes(px)


def flat(w, h, seed):
    return bytes((90, 140, 200, 255)) * (w * h)


def blocks(w, h, seed):
    # hard 16-px-aligned edges: the loop-filter stress case (strong
    # MB-edge deltas) plus flat interiors (Y2/WHT + skip coverage)
    g = lcg(seed)
    cols = [(next(g) & 255, next(g) >> 8 & 255, next(g) >> 16 & 255)
            for _ in range(16)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            c = cols[((x // 16) + 5 * (y // 16)) % 16]
            px += bytes((c[0], c[1], c[2], 255))
    return bytes(px)


def photoish(w, h, seed):
    import math
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = int(127 + 120 * math.sin(x / 5.0 + seed))
            gg = int(127 + 120 * math.sin(y / 7.0 + seed * 2))
            b = int(127 + 120 * math.sin((x + y) / 9.0))
            px += bytes((max(0, min(255, r)), max(0, min(255, gg)),
                         max(0, min(255, b)), 255))
    return bytes(px)


def mixed(w, h, seed):
    # regionally different statistics → multiple segments with
    # different quantizers (libwebp's analysis assigns up to 4)
    g = lcg(seed)
    import math
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if y < h // 3:
                px += bytes((200, 40, 40, 255))
            elif y < 2 * h // 3:
                v = next(g)
                px += bytes((v & 255, (v >> 8) & 255, (v >> 16) & 255, 255))
            else:
                r = int(127 + 120 * math.sin(x / 4.0))
                px += bytes((max(0, min(255, r)), (x * 3) % 256,
                             (y * 5) % 256, 255))
    return bytes(px)


CASES = [
    ("flat_32x32_q75", 32, 32, flat, 1, 75.0),
    ("grad_33x17_q75", 33, 17, gradient, 2, 75.0),
    ("grad_64x48_q20", 64, 48, gradient, 3, 20.0),
    ("noise_24x24_q50", 24, 24, noisy, 4, 50.0),
    ("blocks_80x64_q75", 80, 64, blocks, 5, 75.0),
    ("blocks_80x64_q10", 80, 64, blocks, 6, 10.0),
    ("photo_48x32_q90", 48, 32, photoish, 7, 90.0),
    ("photo_147x101_q60", 147, 101, photoish, 8, 60.0),
    ("mixed_160x120_q45", 160, 120, mixed, 9, 45.0),
    ("photo_200x150_q80", 200, 150, photoish, 10, 80.0),
    ("tiny_3x2_q75", 3, 2, gradient, 11, 75.0),
    ("tall_17x130_q65", 17, 130, photoish, 12, 65.0),
]

index = []
for name, w, h, fn, seed, q in CASES:
    rgba = fn(w, h, seed)
    assert len(rgba) == w * h * 4
    outp = ctypes.POINTER(ctypes.c_ubyte)()
    n = LW.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(outp))
    assert n > 0, name
    webp = bytes(bytearray(outp[i] for i in range(n)))
    LW.WebPFree(outp)

    wv, hv = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = LW.WebPDecodeYUV(webp, n, ctypes.byref(wv), ctypes.byref(hv),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp and wv.value == w and hv.value == h, name
    uvw, uvh = (w + 1) // 2, (h + 1) // 2
    yplane = bytearray()
    for row in range(h):
        yplane += bytes(yp[row * stride.value:row * stride.value + w])
    uplane = bytearray()
    vplane = bytearray()
    for row in range(uvh):
        uplane += bytes(up[row * uv_stride.value:row * uv_stride.value + uvw])
        vplane += bytes(vp[row * uv_stride.value:row * uv_stride.value + uvw])
    LW.WebPFree(yp)

    with open(os.path.join(OUT, name + ".webp"), "wb") as f:
        f.write(webp)
    with open(os.path.join(OUT, name + ".yuv"), "wb") as f:
        f.write(bytes(yplane) + bytes(uplane) + bytes(vplane))
    index.append(f"{name},{w},{h},{q}")
    print(f"{name}: {n} webp bytes")

with open(os.path.join(OUT, "index.txt"), "w") as f:
    f.write("\n".join(index) + "\n")
print("ok")
