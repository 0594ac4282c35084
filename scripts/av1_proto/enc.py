"""od_ec encoder + minimal lossless-keyframe stream writer (prototype of
the test-side independent bitstream writer)."""
import msac
from msac import EC_PROB_SHIFT, EC_MIN_PROB, T

class EncMsac:
    def __init__(self):
        self.low = 0; self.rng = 0x8000; self.cnt = -9
        self.pre = []
        self.allow_update = True

    def _scaled(self, r, f):
        return ((r >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)

    def encode(self, icdf, nsyms, s):
        r = self.rng
        vm = msac.VARIANT_MINPROB
        v = self._scaled(r, icdf[s]) + EC_MIN_PROB * (nsyms - s - 1 + vm)
        if s > 0:
            u = self._scaled(r, icdf[s-1]) + EC_MIN_PROB * (nsyms - s + vm)
            self.low += r - u
            self.rng = u - v
        else:
            self.rng = r - v
        self._normalize()

    def symbol(self, cdf, nsyms, s):
        self.encode(cdf, nsyms, s)
        if self.allow_update:
            cnt = cdf[nsyms]
            rate = 3 + (cnt > 15) + (cnt > 31) + (1 if nsyms <= 3 else 2)
            for i in range(nsyms - 1):
                tmp = 0 if i >= s else 32768
                if tmp < cdf[i]:
                    cdf[i] -= (cdf[i] - tmp) >> rate
                else:
                    cdf[i] += (tmp - cdf[i]) >> rate
            cdf[nsyms] = cnt + (cnt < 32)

    def bool_equi(self, bit):
        self.encode([16384, 0], 2, bit)

    def literal(self, n, v):
        for i in range(n - 1, -1, -1):
            self.bool_equi((v >> i) & 1)

    def golomb(self, v):
        if msac.GOLOMB_LSB:
            # value = x + 2^L - 1 with L lead marks; find L: v+1 in [2^L, 2^{L+1})
            x = v + 1
            L = x.bit_length() - 1
            stop = 0 if msac.GOLOMB_INV else 1
            for _ in range(L): self.bool_equi(1 - stop)
            self.bool_equi(stop)
            rem = v - ((1 << L) - 1)
            for i in range(L): self.bool_equi((rem >> i) & 1)
            return
        x = v + 1
        length = x.bit_length()
        stop = 0 if msac.GOLOMB_INV else 1
        for _ in range(length - 1):
            self.bool_equi(1 - stop)
        # MSB of x is the stop bit (1) in the standard form
        for i in range(length - 1, -1, -1):
            b = (x >> i) & 1
            if i == length - 1:
                self.bool_equi(stop)
            else:
                self.bool_equi(b)

    def _normalize(self):
        d = 16 - self.rng.bit_length()
        s = self.cnt + d
        if s >= 0:
            c = self.cnt + 16
            m = (1 << c) - 1
            if s >= 8:
                self.pre.append((self.low >> c) & 0xFFFF)
                self.low &= m
                c -= 8
                m >>= 8
            self.pre.append((self.low >> c) & 0xFFFF)
            s = c + d - 24
            self.low &= m
        self.low <<= d
        self.rng <<= d
        self.cnt = s

    def done(self):
        l = self.low; c = self.cnt
        s = 10 + c
        m = 0x3FFF
        e = ((l + m) & ~m) | (m + 1)
        pre = list(self.pre)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                pre.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8; c -= 8; n >>= 8
                if s <= 0: break
        out = bytearray(len(pre))
        carry = 0
        for i in range(len(pre) - 1, -1, -1):
            v = pre[i] + carry
            out[i] = v & 0xFF
            carry = v >> 8
        assert carry == 0 or True
        return bytes(out)


class Bw:
    def __init__(s): s.bits = []
    def f(s, v, n):
        for i in range(n - 1, -1, -1): s.bits.append((v >> i) & 1)
    def bytes_aligned(s, trailing=False):
        b = list(s.bits)
        if trailing: b.append(1)
        while len(b) % 8: b.append(0)
        out = bytearray()
        for i in range(0, len(b), 8):
            v = 0
            for x in b[i:i+8]: v = (v << 1) | x
            out.append(v)
        return bytes(out)


def leb128(v):
    out = bytearray()
    while True:
        b = v & 0x7F; v >>= 7
        if v: out.append(b | 0x80)
        else: out.append(b); break
    return bytes(out)

def obu(t, payload):
    return bytes([ (t << 3) | 2 ]) + leb128(len(payload)) + payload

def seq_obu(w, h, filter_intra=1, intra_edge=1, use128=1, mono=0):
    bw = Bw()
    bw.f(0, 3)  # profile
    bw.f(1, 1)  # still picture
    bw.f(1, 1)  # reduced header
    bw.f(0, 5)  # level
    wb = max((w - 1).bit_length(), 1); hb = max((h - 1).bit_length(), 1)
    bw.f(wb - 1, 4); bw.f(hb - 1, 4)
    bw.f(w - 1, wb); bw.f(h - 1, hb)
    bw.f(use128, 1)
    bw.f(filter_intra, 1)
    bw.f(intra_edge, 1)
    bw.f(0, 1); bw.f(0, 1); bw.f(0, 1)  # superres cdef restoration
    bw.f(0, 1)  # high bitdepth
    bw.f(mono, 1)
    bw.f(0, 1)  # color desc present
    if mono:
        bw.f(0, 1)  # color range
    else:
        bw.f(0, 1)  # color range
        bw.f(0, 2)  # chroma sample position
        bw.f(0, 1)  # separate uv dq
    bw.f(0, 1)  # film grain
    return obu(1, bw.bytes_aligned(trailing=True))

def frame_obu(w, h, tile_bytes, disable_cdf_update=0, mono=0):
    bw = Bw()
    bw.f(disable_cdf_update, 1)
    bw.f(0, 1)  # allow_screen_content_tools (force==SELECT under reduced)
    bw.f(0, 1)  # render_and_frame_size_different
    bw.f(1, 1)  # uniform tile spacing
    # single-tile: emit increment flags only while log2 < max (spec 5.9.15)
    sbShift = 5
    MiCols = 2*((w+7)>>3); MiRows = 2*((h+7)>>3)
    sbCols = (MiCols + 31) >> 5
    sbRows = (MiRows + 31) >> 5
    def tlog2(b, t):
        k = 0
        while (b << k) < t: k += 1
        return k
    if tlog2(1, min(sbCols, 64)) > 0: bw.f(0, 1)
    if tlog2(1, min(sbRows, 64)) > 0: bw.f(0, 1)
    bw.f(0, 8)  # base_q_idx
    if mono:
        bw.f(0, 1)  # delta_q y dc only
    else:
        bw.f(0, 1); bw.f(0, 1); bw.f(0, 1)
    bw.f(0, 1)  # using_qmatrix
    bw.f(0, 1)  # segmentation_enabled
    bw.f(0, 1)  # reduced_tx_set  (CodedLossless: no delta_q/lf/cdef/lr bits)
    hdr = bw.bytes_aligned(trailing=False)
    return obu(6, hdr + tile_bytes)

def stream(w, h, tile_bytes, **kw):
    mono = kw.get('mono', 0)
    return obu(2, b'') + seq_obu(w, h, **kw) + \
        frame_obu(w, h, tile_bytes, mono=mono)
