"""MSAC (od_ec) decoder per AV1 spec 8.2 / libaom entdec conventions."""
import json

T = json.load(open('/tmp/av1_tables.json'))

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
VARIANT_MINPROB = 0
GOLOMB_INV = False
GOLOMB_LSB = False
W = 32  # window bits

class Msac:
    def __init__(self, buf, allow_update=True):
        self.b = buf
        self.bptr = 0
        self.end = len(buf)
        self.dif = (1 << (W - 1)) - 1
        self.rng = 0x8000
        self.cnt = -15
        self.allow_update = allow_update
        self.trace = None
        self.refill()

    def refill(self):
        s = W - 9 - (self.cnt + 15)
        while s >= 0 and self.bptr < self.end:
            self.dif ^= self.b[self.bptr] << s
            self.cnt += 8
            self.bptr += 1
            s -= 8
        if self.bptr >= self.end:
            self.cnt = 0x4000

    def normalize(self, dif, rng):
        d = 16 - rng.bit_length()
        self.cnt -= d
        self.dif = (((dif + 1) << d) - 1) & ((1 << W) - 1)
        self.rng = rng << d
        if self.cnt < 0:
            self.refill()

    def decode(self, icdf, nsyms):
        """icdf: list with >= nsyms entries (boundaries + 0 term).
        Returns symbol. No adaptation."""
        c = self.dif >> (W - 16)
        r = self.rng
        v = r
        ret = -1
        while True:
            ret += 1
            u = v
            v = ((r >> 8) * (icdf[ret] >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)
            v += EC_MIN_PROB * (nsyms - ret - 1 + VARIANT_MINPROB)
            if c >= v:
                break
        self.normalize(self.dif - (v << (W - 16)), u - v)
        return ret

    def symbol_ab(self, cdf, nsyms, ab):
        if len(ab) == 3:
            A, B, S = ab
        else:
            A, B = ab; S = 1
        c = self.dif >> (W - 16)
        r = self.rng
        v = r
        ret = -1
        while True:
            ret += 1
            u = v
            v = ((r >> 8) * (cdf[ret] >> EC_PROB_SHIFT)) >> S
            v += max(A + B * ret, 0)
            if c >= v or ret >= nsyms - 1:
                break
        self.normalize(self.dif - (v << (W - 16)), u - v)
        # adapt as usual
        cnt = cdf[nsyms]
        rate = 3 + (cnt > 15) + (cnt > 31) + (1 if nsyms <= 3 else 2)
        for i in range(nsyms - 1):
            tmp = 0 if i >= ret else 32768
            if tmp < cdf[i]:
                cdf[i] -= (cdf[i] - tmp) >> rate
            else:
                cdf[i] += (tmp - cdf[i]) >> rate
        cdf[nsyms] = cnt + (cnt < 32)
        return ret

    def symbol(self, cdf, nsyms):
        """cdf: mutable list [n-1 bounds, 0, counter]; adapts in place."""
        ret = self.decode(cdf, nsyms)
        if self.trace is not None:
            self.trace.append(ret)
        if self.allow_update:
            cnt = cdf[nsyms]
            # nsymbs2speed = {2:1, 3:1, >=4:2} (libaom prob.h update_cdf)
            rate = 3 + (cnt > 15) + (cnt > 31) + (1 if nsyms <= 3 else 2)
            for i in range(nsyms - 1):
                tmp = 0 if i >= ret else 32768
                if tmp < cdf[i]:
                    cdf[i] -= (cdf[i] - tmp) >> rate
                else:
                    cdf[i] += (tmp - cdf[i]) >> rate
            cdf[nsyms] = cnt + (cnt < 32)
        return ret

    def bool_equi(self):
        return self.decode([16384, 0], 2)

    def literal(self, n):
        x = 0
        for _ in range(n):
            x = (x << 1) | self.bool_equi()
        return x

    def golomb(self):
        stop = 0 if GOLOMB_INV else 1
        length = 0
        while self.bool_equi() != stop and length < 16:
            length += 1
        if GOLOMB_LSB:
            x = 0
            for i in range(length):
                x |= self.bool_equi() << i
            return x + (1 << length) - 1
        x = 1
        for _ in range(length):
            x = (x << 1) | self.bool_equi()
        return x - 1


def cdf_rows(name):
    """split flat table into per-chunk mutable rows of the stride"""
    stride = T['_strides'][name]
    flat = T[name]
    return [list(flat[i:i + stride]) for i in range(0, len(flat), stride)]
