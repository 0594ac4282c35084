#!/usr/bin/env python3
"""Brotli (RFC 7932) deployment data + golden fixtures, from the
system's own brotli — the in-environment-snapshot convention (JDK
charset tables, PSL file, libwebp goldens):

  data/brotli_dict.bin         the 122,784-byte static dictionary,
                               extracted from libbrotlicommon and
                               REQUIRED to hash to the SHA-256 value
                               printed in RFC 7932 §8
  data/brotli_context_lut.bin  the 2,048-byte literal-context lookup
                               (4 modes × Lut0/Lut1), located by its
                               LSB6 prefix
  data/brotli_transforms.dat   the 121 word transforms, derived
                               BEHAVIORALLY: hand-assembled streams
                               with one dictionary reference each are
                               decompressed by brotlicffi (the real
                               decoder), and (prefix, op, suffix) are
                               solved from the outputs for two
                               different words per transform
  data/brotli_golden/          .br/.raw pairs compressed by brotlicffi
                               at qualities 0/1/5/9/10/11 over text,
                               binary, and repetitive corpora

Run with /root/miniconda/bin/python3 (brotlicffi lives there).
"""
import ctypes, hashlib, os, struct, sys

try:
    import brotlicffi
except ImportError:
    sys.exit("run with /root/miniconda/bin/python3 (needs brotlicffi)")

SO = '/root/miniconda/pkgs/libbrotlicommon-1.2.0-h32cd6e7_0/lib/libbrotlicommon.so.1.2.0'
OUT = os.path.join(os.path.dirname(__file__), '..', 'data')
os.makedirs(os.path.join(OUT, 'brotli_golden'), exist_ok=True)

data = open(SO, 'rb').read()

# ---------------------------------------------------------------
# 1. static dictionary (hash-pinned to the RFC's published value)
# ---------------------------------------------------------------
RFC_SHA256 = '20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70'
i = data.find(b'timedownlifeleftbackcodedatashow')
assert i > 0
DICT = data[i:i + 122784]
assert hashlib.sha256(DICT).hexdigest() == RFC_SHA256, 'dictionary hash mismatch'
open(os.path.join(OUT, 'brotli_dict.bin'), 'wb').write(DICT)
print('dict ok (sha256 matches RFC 7932)')

# ---------------------------------------------------------------
# 2. context lookup table
# ---------------------------------------------------------------
lsb6 = bytes(i & 0x3F for i in range(256))
j = data.find(lsb6)
assert j > 0
LUT = data[j:j + 2048]
assert LUT[512:768] == bytes(i >> 2 for i in range(256))
open(os.path.join(OUT, 'brotli_context_lut.bin'), 'wb').write(LUT)
print('context lut ok')

# dictionary bucket geometry (verified against the extracted offsets)
SIZE_BITS = [0,0,0,0,10,10,11,11,10,10,10,10,10,9,9,8,7,7,8,7,7,6,6,5,5]
OFFSETS = [0]*25
for L in range(4, 25):
    OFFSETS[L] = OFFSETS[L-1] + (L-1 if L-1 >= 4 else 0) * (1 << SIZE_BITS[L-1])
off = 0
offs = {}
for L in range(4, 25):
    offs[L] = off
    off += L << SIZE_BITS[L]
assert off == 122784

# ---------------------------------------------------------------
# 3. transforms, behaviorally
# ---------------------------------------------------------------
class BW:
    def __init__(self):
        self.bits_ = []
    def bits(self, v, n):
        for k in range(n):
            self.bits_.append((v >> k) & 1)
    def msb(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bits_.append((v >> k) & 1)
    def bytes(self):
        out = bytearray()
        cur = n = 0
        for b in self.bits_:
            cur |= b << n
            n += 1
            if n == 8:
                out.append(cur); cur = n = 0
        if n:
            out.append(cur)
        return bytes(out)


def simple1(w, sym, abits):
    w.bits(1, 2)      # HSKIP=1: simple code
    w.bits(0, 2)      # NSYM-1 = 0
    w.bits(sym, abits)


def dict_ref_stream(L, word_idx, tid, mlen):
    """one metablock: a single insert0/copyL command whose distance
    addresses static-dictionary word (L, word_idx) with transform tid.
    mlen must equal the transformed output length."""
    w = BW()
    w.bits(0, 1)  # WBITS = 16
    w.bits(1, 1)  # ISLAST
    w.bits(0, 1)  # ISLASTEMPTY
    w.bits(0, 2)  # MNIBBLES code 0 -> 4 nibbles
    w.bits(mlen - 1, 16)
    w.bits(0, 1)  # NBLTYPESL = 1
    w.bits(0, 1)  # NBLTYPESI = 1
    w.bits(0, 1)  # NBLTYPESD = 1
    w.bits(0, 2)  # NPOSTFIX
    w.bits(0, 4)  # NDIRECT >> NPOSTFIX
    w.bits(0, 2)  # context mode for the single literal block type
    w.bits(0, 1)  # NTREESL = 1
    w.bits(0, 1)  # NTREESD = 1
    simple1(w, 97, 8)  # literal code: single 'a' (never used)
    # command: insert code 0 (len 0), copy code for length L, explicit
    # distance -> cell 2 of the 11x64 table when copy<=9, else cells
    # with high copy bits. length L: copy code c: 0..7 -> 2..9 (0 xb),
    # 8..9 -> 10,12 (1 xb), 10..11 -> 14,18 (2 xb), ...
    COPY_BASE = [2,3,4,5,6,7,8,9,10,12,14,18,22,30,38,54,70,102,134,198,326,582,1094,2118]
    COPY_XB =   [0,0,0,0,0,0,0,0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,10,24]
    cc = max(c for c in range(24) if COPY_BASE[c] <= L)
    cxb = COPY_XB[cc]
    cextra = L - COPY_BASE[cc]
    assert cextra < (1 << cxb) if cxb else cextra == 0
    # cells: 0:(i0-7,c0-7,implicit) 1:(i0-7,c8-15,implicit) 2:(i0-7,c0-7)
    # 3:(i0-7,c8-15) 4:(i8-15,c0-7) 5:(i8-15,c8-15) 6:(i0-7,c16-23)
    # 7:(i16-23,c0-7) 8:(i8-15,c16-23) 9:(i16-23,c8-15) 10:(i16-23,c16-23)
    ihi, chi = 0, cc >> 3
    cell = {(0,0): 2, (0,1): 3, (0,2): 6}[(ihi, chi)]
    cmd = cell * 64 + ((0 & 7) << 3) | (cc & 7)
    simple1(w, cmd, 10)
    # distance: max_backward for WBITS16 at stream start = mlen-limited:
    # max_distance = min(pos, window-16); at the command, pos=0 ->
    # max_distance = 0?? No: copy at position 0 with no prior bytes ->
    # any distance > 0 is a dictionary reference with max_distance = 0?
    # RFC: max allowed backward distance is min(window_size, position).
    # position = 0 here, so address = distance - max_allowed - 1 =
    # distance - 1.
    address = word_idx + (tid << SIZE_BITS[L])
    dist = address + 1  # max_allowed = 0 at position 0
    # distance code >= 16 (npostfix=ndirect=0):
    # ndistbits = 1 + ((code-16) >> 1)
    # offset = ((2 + ((code-16) & 1)) << ndistbits) - 4
    # dist = offset + extra + 1
    dcode = dextra = dn = None
    for code in range(16, 64):
        n = 1 + ((code - 16) >> 1)
        offset = ((2 + ((code - 16) & 1)) << n) - 4
        lo = offset + 0 + 1
        hi = offset + ((1 << n) - 1) + 1
        if lo <= dist <= hi:
            dcode, dextra, dn = code, dist - lo, n
            break
    assert dcode is not None, dist
    simple1(w, dcode, 6)
    # data: all three symbol codes are single-symbol (0 bits); only
    # the copy-length extra bits and distance extra bits are emitted
    if cxb:
        w.bits(cextra, cxb)
    w.bits(dextra, dn)
    return w.bytes()


def try_decode(L, word_idx, tid):
    """search the output length (transforms shift length by <= 13)"""
    for mlen in range(max(1, L - 12), L + 26):
        try:
            out = brotlicffi.decompress(dict_ref_stream(L, word_idx, tid, mlen))
            return out
        except Exception:
            continue
    return None


# sanity: identity transform must reproduce raw dictionary words
for (L, idx) in [(4, 0), (6, 1), (10, 5), (24, 2)]:
    word = DICT[offs[L] + idx * L: offs[L] + (idx + 1) * L]
    got = try_decode(L, idx, 0)
    assert got == word, (L, idx, got, word)
print('identity dictionary references verified against brotlicffi')

# derive all 121 transforms from two words
FERMENT_HINT = {}

def ferment_all(word):
    out = bytearray(word)
    i = 0
    while i < len(out):
        c = out[i]
        if c < 192:
            if 97 <= c <= 122:
                out[i] ^= 32
            i += 1
        elif c < 224:
            if i + 1 < len(out):
                out[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < len(out):
                out[i + 2] ^= 5
            i += 3
    return bytes(out)

def ferment_first(word):
    out = bytearray(word)
    c = out[0]
    if c < 192:
        if 97 <= c <= 122:
            out[0] ^= 32
    elif c < 224:
        if len(out) > 1:
            out[1] ^= 32
    else:
        if len(out) > 2:
            out[2] ^= 5
    return bytes(out)

OPS = {}
def candidates(word):
    c = {'I': word, 'UF': ferment_first(word), 'UA': ferment_all(word)}
    for k in range(1, 10):
        if len(word) > k:
            c[f'OF{k}'] = word[k:]
            c[f'OL{k}'] = word[:-k]
    return c

rows = []
# several bucket lengths: long-omit transforms EMPTY a short word
# (the metablock then cannot complete, so that probe never decodes)
PROBES = [(8, 3), (8, 7), (13, 2), (13, 9), (16, 4), (20, 1)]
for tid in range(121):
    sols = None
    n_ok = 0
    for (L, idx) in PROBES:
        word = DICT[offs[L] + idx * L: offs[L] + (idx + 1) * L]
        out = try_decode(L, idx, tid)
        if out is None:
            continue
        n_ok += 1
        here = set()
        for op, core in candidates(word).items():
            p = out.find(core) if core else 0
            if core and p >= 0:
                # take every split (prefix = out[:p0]) for robustness
                start = 0
                while True:
                    p = out.find(core, start)
                    if p < 0:
                        break
                    here.add((out[:p], op, out[p + len(core):]))
                    start = p + 1
        sols = here if sols is None else (sols & here)
        if sols is not None and len(sols) == 1 and n_ok >= 2:
            break
    assert sols and n_ok >= 2, f'transform {tid} underdetermined ({n_ok} probes)'
    # prefer the simplest consistent op (identity > ferment > omit)
    order = {'I': 0, 'UF': 1, 'UA': 2}
    pre, op, suf = sorted(sols,
        key=lambda s: (len(s[0]) + len(s[2]), order.get(s[1], 3)))[0]
    rows.append((pre, op, suf))

def esc(b):
    return ''.join(f'\\x{c:02x}' if c in (0x5c, 0x09, 0x0a, 0x0d) or c < 32 or c > 126
                   else chr(c) for c in b)

with open(os.path.join(OUT, 'brotli_transforms.dat'), 'w') as f:
    f.write('# tid<TAB>prefix<TAB>op<TAB>suffix — derived behaviorally from\n')
    f.write('# the system brotli (see scripts/make_brotli_data.py)\n')
    for tid, (pre, op, suf) in enumerate(rows):
        f.write(f'{tid}\t{esc(pre)}\t{op}\t{esc(suf)}\n')
print(f'transforms ok ({len(rows)} rows); tid0 = {rows[0]}')

# ---------------------------------------------------------------
# 4. golden corpus
# ---------------------------------------------------------------
def lcg(seed):
    s = seed
    while True:
        s = (1103515245 * s + 12345) & 0x7FFFFFFF
        yield s

text = (("the quick brown fox jumps over the lazy dog. " * 40) +
        ("information about the data processing pipeline for the "
         "people working with this system and their documents. " * 60) +
        "".join(chr(0x3042 + (k % 80)) for k in range(400))).encode('utf-8')
g = lcg(7)
binary = bytes(next(g) & 0xFF for _ in range(20000))
rep = (b"abcdefgh" * 500 + b"ABCDEFGH" * 500) * 3
mixed = text[:3000] + binary[:3000] + rep[:3000] + text[3000:6000]

cases = []
for name, raw in [('text', text), ('binary', binary), ('rep', rep), ('mixed', mixed)]:
    for q in (0, 1, 5, 9, 10, 11):
        br = brotlicffi.compress(raw, quality=q)
        assert brotlicffi.decompress(br) == raw
        nm = f'{name}_q{q}'
        open(os.path.join(OUT, 'brotli_golden', nm + '.br'), 'wb').write(br)
        open(os.path.join(OUT, 'brotli_golden', nm + '.raw'), 'wb').write(raw)
        cases.append(nm)
# small-window variant + tiny inputs
for name, raw, kw in [('text_w10', text, dict(quality=9, lgwin=10)),
                      ('tiny', b'abc', dict(quality=5)),
                      ('empty', b'', dict(quality=5))]:
    br = brotlicffi.compress(raw, **kw)
    assert brotlicffi.decompress(br) == raw
    open(os.path.join(OUT, 'brotli_golden', name + '.br'), 'wb').write(br)
    open(os.path.join(OUT, 'brotli_golden', name + '.raw'), 'wb').write(raw)
    cases.append(name)
# hand-assembled dictionary-reference streams (verified by brotlicffi
# right here) — pin the dictionary + transform path explicitly
dict_cases = [(8, 3, 0), (8, 3, 53), (13, 2, 9), (16, 4, 44), (20, 1, 118)]
for n, (L, idx, tid) in enumerate(dict_cases):
    out = try_decode(L, idx, tid)
    assert out is not None, (L, idx, tid)
    # re-derive the exact stream for the found length
    br = None
    for mlen in range(max(1, L - 12), L + 26):
        cand = dict_ref_stream(L, idx, tid, mlen)
        try:
            if brotlicffi.decompress(cand) == out:
                br = cand
                break
        except Exception:
            continue
    assert br is not None
    nm = f'dictref{n}'
    open(os.path.join(OUT, 'brotli_golden', nm + '.br'), 'wb').write(br)
    open(os.path.join(OUT, 'brotli_golden', nm + '.raw'), 'wb').write(out)
    cases.append(nm)

with open(os.path.join(OUT, 'brotli_golden', 'index.txt'), 'w') as f:
    f.write('\n'.join(cases) + '\n')
print(f'{len(cases)} goldens written')
