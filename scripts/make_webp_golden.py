#!/usr/bin/env python3
"""Golden WebP-lossless fixtures from the system's own libwebp
(public C ABI via ctypes) — the in-environment-validator convention
(JDK charset decoders, zstd-jni): real encoder output exercises
transform selection, LZ77 and color-cache decisions the Scala decoder
must reproduce pixel-exactly.

Writes data/webp_golden/<name>.webp and <name>.argb (big-endian u32
ARGB, row-major) plus an index.txt of name,width,height rows.

Deterministic (fixed LCG; no RNG module), rerunnable.
"""
import ctypes, os, struct

LW = ctypes.CDLL("libwebp.so.7")
LW.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LW.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LW.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LW.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "webp_golden")
os.makedirs(OUT, exist_ok=True)


def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (1103515245 * s + 12345) & 0x7FFFFFFF
        yield s


def gradient(w, h, seed):
    g = lcg(seed)
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


def palette(w, h, seed):
    cols = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255),
            (255, 255, 0, 255), (0, 0, 0, 255), (255, 255, 255, 255)]
    g = lcg(seed)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(cols[(x // 3 + y // 2 + (next(g) % 2)) % len(cols)])
    return bytes(px)


def repeats(w, h, seed):
    # long horizontal runs + repeated tiles: LZ77- and cache-friendly
    g = lcg(seed)
    row = [next(g) for _ in range(8)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = row[(x // 7 + y // 5) % 8]
            px += bytes((v & 255, (v >> 9) & 255, (v >> 17) & 255, 255))
    return bytes(px)


def photoish(w, h, seed):
    import math
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = int(127 + 120 * math.sin(x / 5.0 + seed))
            gg = int(127 + 120 * math.sin(y / 7.0 + seed * 2))
            b = int(127 + 120 * math.sin((x + y) / 9.0))
            a = 255 if (x + y) % 11 else 200  # some alpha variation
            px += bytes((max(0, min(255, r)), max(0, min(255, gg)),
                         max(0, min(255, b)), a))
    return bytes(px)


def mixed(w, h, seed):
    # regionally different statistics: flat top, noise band, photo
    # bottom — pushes the encoder toward META prefix codes (multiple
    # entropy groups); repeated rows force LONG LZ77 distances
    g = lcg(seed)
    import math
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if y < h // 4:
                px += bytes((200, 40, 40, 255))
            elif y < h // 2:
                v = next(g)
                px += bytes((v & 255, (v >> 8) & 255, (v >> 16) & 255, 255))
            elif y < 3 * h // 4:
                # repeat of the top-quarter row pattern, far away
                px += bytes((200, 40, 40, 255))
            else:
                r = int(127 + 120 * math.sin(x / 4.0))
                px += bytes((max(0, min(255, r)), (x * 3) % 256, (y * 5) % 256, 255))
    return bytes(px)


CASES = [
    ("grad_33x17", 33, 17, gradient, 1),
    ("noise_24x24", 24, 24, noisy, 2),
    ("palette_40x21", 40, 21, palette, 3),
    ("repeat_64x33", 64, 33, repeats, 4),
    ("photo_48x32", 48, 32, photoish, 5),
    ("tiny_3x2", 3, 2, gradient, 6),
    ("wide_130x7", 130, 7, repeats, 7),
    ("mixed_160x120", 160, 120, mixed, 8),
    ("photo_200x150", 200, 150, photoish, 9),
]

index = []
for name, w, h, fn, seed in CASES:
    rgba = fn(w, h, seed)
    assert len(rgba) == w * h * 4
    outp = ctypes.POINTER(ctypes.c_ubyte)()
    n = LW.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(outp))
    assert n > 0, name
    webp = bytes(bytearray(outp[i] for i in range(n)))
    LW.WebPFree(outp)

    # round-trip through libwebp itself: the .argb golden is what the
    # REFERENCE decoder produces (identical to input for lossless)
    wv, hv = ctypes.c_int(), ctypes.c_int()
    dec = LW.WebPDecodeRGBA(webp, n, ctypes.byref(wv), ctypes.byref(hv))
    assert wv.value == w and hv.value == h, name
    back = bytes(bytearray(dec[i] for i in range(w * h * 4)))
    LW.WebPFree(dec)
    assert back == rgba, f"{name}: libwebp round-trip not lossless?"

    argb = bytearray()
    for i in range(0, len(back), 4):
        r, gg, b, a = back[i], back[i + 1], back[i + 2], back[i + 3]
        argb += struct.pack(">I", (a << 24) | (r << 16) | (gg << 8) | b)
    with open(os.path.join(OUT, name + ".webp"), "wb") as f:
        f.write(webp)
    with open(os.path.join(OUT, name + ".argb"), "wb") as f:
        f.write(bytes(argb))
    index.append(f"{name},{w},{h}")
    print(f"{name}: {n} webp bytes")

with open(os.path.join(OUT, "index.txt"), "w") as f:
    f.write("\n".join(index) + "\n")
print("ok")
