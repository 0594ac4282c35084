"""Tile/partition/block decode for the lossless-keyframe prototype."""
from msac import Msac, cdf_rows, T
from dec import *

SKIP_CONTEXTS = [[1,2,2,2,3],[1,4,4,4,5],[1,4,4,4,5],[1,4,4,4,5],[1,4,4,4,6]]
NZ_OFF_4x4 = [0,1,6,6, 1,6,6,21, 6,6,21,21, 6,21,21,21]
SCAN4 = T['SCAN4']
BR_DC_EXC = True
BR_FORCE_CTX = None
TSK_RULE = 'minmax'
BEOB_FORCE = None
BASE_FORCE = None
BR_MAX_READS = 4
COEF_STRUCT = 'inter'
LV_CAP = 127
BR_AB = None
BR_NSYMS = 4
BEOB_AB = None
BR_ADAPT = 'each'
TSK_FORCE_L = None
TSK_FORCE_C = None
DRV = T['DR']
SMW = T['SM']
FIT = T['FT']

class Cdfs:
    """mutable per-frame CDF set (default-initialised)"""
    def __init__(self):
        for name in ['Partition','KfYMode','UvMode','AngleDelta','Skip',
                     'FilterIntra','FilterIntraMode','CflSign','CflAlpha',
                     'TxbSkip','EobPt16','EobExtra','CoeffBaseEob','CoeffBase',
                     'CoeffBr','DcSign']:
            setattr(self, name, cdf_rows(name))

class Dec:
    def __init__(self, data, variants=None):
        self.seq, self.fh, tb = parse_obus(data)
        self.var = variants or {}
        fh = self.fh
        self.MiCols, self.MiRows = fh['MiCols'], fh['MiRows']
        self.W4, self.H4 = self.MiCols, self.MiRows  # luma 4x4 grid
        lw, lh = self.MiCols*4, self.MiRows*4
        self.plane = [ [[0]*lw for _ in range(lh)],
                       [[0]*(lw>>1) for _ in range(lh>>1)],
                       [[0]*(lw>>1) for _ in range(lh>>1)] ]
        self.planeW = [lw, lw>>1, lw>>1]; self.planeH = [lh, lh>>1, lh>>1]
        self.YModes = [[DC]*self.MiCols for _ in range(self.MiRows)]
        self.UVModes = [[DC]*self.MiCols for _ in range(self.MiRows)]
        self.Skips = [[0]*self.MiCols for _ in range(self.MiRows)]
        self.AbovePart = [0]*self.MiCols
        self.LeftPart = [0]*(1<<fh.get('sbShift',5) if False else 32)
        self.AboveLvl = [ [0]*self.MiCols for _ in range(3) ]  # plane x4 cols (chroma uses >>1 indices)
        self.LeftLvl = [ [0]*self.MiRows for _ in range(3) ]
        self.AboveDc = [ [0]*self.MiCols for _ in range(3) ]
        self.LeftDc = [ [0]*self.MiRows for _ in range(3) ]
        self.cdfs = Cdfs()
        self.sbMi = 32 if self.seq['use128'] else 16
        self.sbBs = 15 if self.seq['use128'] else 12  # BLOCK_128X128 / 64X64
        self.tb = tb
        self.trace = []
        self.tile_r0 = 0; self.tile_c0 = 0
        self.tile_r1 = self.MiRows; self.tile_c1 = self.MiCols

    def decode_frame(self):
        fh = self.fh
        shift = 5 if self.seq['use128'] else 4
        cols = fh['tileCols'] + [fh['sbCols']]
        rows = fh['tileRows'] + [fh['sbRows']]
        ntiles = (len(cols) - 1) * (len(rows) - 1)
        tb = self.tb
        p = 0
        if ntiles > 1:
            # tile_group header: tile_start_and_end_present_flag then
            # byte alignment (libaom emits one full tile group, flag 0)
            assert (tb[0] & 0x80) == 0, 'partial tile groups unsupported'
            p = 1
        ti = 0
        for tr in range(len(rows) - 1):
            for tc in range(len(cols) - 1):
                if ti < ntiles - 1:
                    sz = int.from_bytes(
                        tb[p:p + fh['tileSzBytes']], 'little') + 1
                    p += fh['tileSzBytes']
                else:
                    sz = len(tb) - p
                self.decode_tile(tb[p:p + sz],
                                 min(rows[tr] << shift, self.MiRows),
                                 min(rows[tr + 1] << shift, self.MiRows),
                                 min(cols[tc] << shift, self.MiCols),
                                 min(cols[tc + 1] << shift, self.MiCols))
                p += sz
                ti += 1
        return self

    def decode_tile(self, data, r0, r1, c0, c1):
        fh = self.fh
        self.tile_r0, self.tile_r1 = r0, r1
        self.tile_c0, self.tile_c1 = c0, c1
        # tiles are independent: fresh default CDFs, cleared above
        # context over the tile's columns
        self.cdfs = Cdfs()
        for c in range(c0, c1):
            self.AbovePart[c] = 0
        for pl in range(3):
            sub = 1 if pl else 0
            for c in range(c0 >> sub, max(c0 >> sub, c1 >> sub)):
                self.AboveLvl[pl][c] = 0
                self.AboveDc[pl][c] = 0
        self.r = Msac(data, allow_update=(fh['disable_cdf_update'] == 0))
        for sr in range(r0, r1, self.sbMi):
            for pl in range(3):
                for i in range(len(self.LeftLvl[pl])):
                    self.LeftLvl[pl][i] = 0
                    self.LeftDc[pl][i] = 0
            self.LeftPart = [0] * 32
            for sc in range(c0, c1, self.sbMi):
                self.clear_block_decoded(sr, sc)
                self.decode_partition(sr, sc, self.sbBs)

    # ---------------- BlockDecoded ----------------
    def clear_block_decoded(self, r, c):
        self.sbR, self.sbC = r, c
        self.bd = []
        for p in range(3):
            sub = 1 if p else 0
            sz = self.sbMi >> sub
            sbW4 = (min(self.MiCols, self.MiCols) - c) >> sub
            sbW4 = (self.tile_c1 - c) >> sub
            sbH4 = (self.tile_r1 - r) >> sub
            g = {}
            for y in range(-1, sz+1):
                for x in range(-1, sz+1):
                    if y < 0 and x < sbW4: g[(y,x)] = 1
                    elif x < 0 and y < sbH4: g[(y,x)] = 1
                    else: g[(y,x)] = 0
            g[(sz, -1)] = 0
            self.bd.append(g)

    def bdget(self, p, y, x):
        return self.bd[p].get((y,x), 0)

    # ---------------- partition ----------------
    def decode_partition(self, r, c, bs):
        if r >= self.tile_r1 or c >= self.tile_c1: return
        w4 = w4of(bs)
        hbs = w4 >> 1
        bsl = (BW[bs].bit_length() - 3)  # 8->1? 8px: bit_length(8)=4-3=1 ok; 128->5
        hasRows = (r + hbs) < self.tile_r1
        hasCols = (c + hbs) < self.tile_c1
        rd = self.r
        if bs == SQ[8] or BW[bs] == 8:
            nsym = 4
        elif BW[bs] == 128:
            nsym = 8
        else:
            nsym = 10
        if BW[bs] < 8:
            part = P_NONE
        elif hasRows and hasCols:
            above = (self.AbovePart[c] >> (bsl - 1)) & 1
            left = (self.LeftPart[r & 31] >> (bsl - 1)) & 1
            ctx = (bsl - 1) * 4 + left * 2 + above
            part = rd.symbol(self.cdfs.Partition[ctx], nsym)
            if nsym == 8 and part >= P_HORZ_4:
                part = part  # 8 syms: 0..7 map directly (no HORZ_4/VERT_4)
        elif hasCols:
            # split_or_horz
            part = P_SPLIT if self.gather_bool(r, c, bs, bsl, nsym, horz=True) else P_HORZ
        elif hasRows:
            part = P_SPLIT if self.gather_bool(r, c, bs, bsl, nsym, horz=False) else P_VERT
        else:
            part = P_SPLIT
        sub = subsize(part, bs)
        splitSz = subsize(P_SPLIT, bs) if BW[bs] > 4 else bs
        if part == P_NONE:
            self.decode_block(r, c, bs)
        elif part == P_HORZ:
            self.decode_block(r, c, sub)
            if hasRows: self.decode_block(r+hbs, c, sub)
        elif part == P_VERT:
            self.decode_block(r, c, sub)
            if hasCols: self.decode_block(r, c+hbs, sub)
        elif part == P_SPLIT:
            self.decode_partition(r, c, splitSz)
            self.decode_partition(r, c+hbs, splitSz)
            self.decode_partition(r+hbs, c, splitSz)
            self.decode_partition(r+hbs, c+hbs, splitSz)
        elif part == P_HORZ_A:
            self.decode_block(r, c, splitSz)
            self.decode_block(r, c+hbs, splitSz)
            self.decode_block(r+hbs, c, sub)
        elif part == P_HORZ_B:
            self.decode_block(r, c, sub)
            self.decode_block(r+hbs, c, splitSz)
            self.decode_block(r+hbs, c+hbs, splitSz)
        elif part == P_VERT_A:
            self.decode_block(r, c, splitSz)
            self.decode_block(r+hbs, c, splitSz)
            self.decode_block(r, c+hbs, sub)
        elif part == P_VERT_B:
            self.decode_block(r, c, sub)
            self.decode_block(r, c+hbs, splitSz)
            self.decode_block(r+hbs, c+hbs, splitSz)
        elif part == P_HORZ_4:
            qbs = w4 >> 2
            for i in range(4):
                rr = r + i*qbs
                if i > 0 and rr >= self.tile_r1: break
                self.decode_block(rr, c, sub)
        elif part == P_VERT_4:
            qbs = w4 >> 2
            for i in range(4):
                cc = c + i*qbs
                if i > 0 and cc >= self.tile_c1: break
                self.decode_block(r, cc, sub)
        # ctx update
        self.update_ext_part_ctx(r, c, sub, bs, part)

    def gather_bool(self, r, c, bs, bsl, nsym, horz):
        above = (self.AbovePart[c] >> (bsl - 1)) & 1
        left = (self.LeftPart[r & 31] >> (bsl - 1)) & 1
        ctx = (bsl - 1) * 4 + left * 2 + above
        icdf = self.cdfs.Partition[ctx]
        def prob(e):
            lo = 32768 if e == 0 else icdf[e-1]
            return lo - icdf[e]
        # split-alike probability: partitions that cut the VISIBLE half along
        # the midline (trace-verified against dav1d at frame edges).
        # split_or_horz (cols missing, horz=True): vertical-cut set;
        # split_or_vert (rows missing): horizontal-cut set.
        if horz:  # right half missing: does the top-half region split again?
            ps = prob(P_VERT) + prob(P_SPLIT)
            if nsym > 4: ps += prob(P_VERT_A) + prob(P_VERT_B) + prob(P_HORZ_A)
            if nsym == 10: ps += prob(P_VERT_4)
        else:     # bottom half missing: horizontal-cut set
            ps = prob(P_HORZ) + prob(P_SPLIT)
            if nsym > 4: ps += prob(P_HORZ_A) + prob(P_HORZ_B) + prob(P_VERT_A)
            if nsym == 10: ps += prob(P_HORZ_4)
        bit = self.r.decode([ps, 0], 2)
        return bit == 1

    def update_part_ctx(self, r, c, sub, bsAreaSz):
        w4a = w4of(bsAreaSz); h4a = h4of(bsAreaSz)
        av = (31 << (w4of(sub).bit_length()-1)) & 31
        lv = (31 << (h4of(sub).bit_length()-1)) & 31
        for i in range(w4a):
            if c+i < self.MiCols: self.AbovePart[c+i] = av
        for i in range(h4a):
            self.LeftPart[(r+i) & 31] = lv

    def update_ext_part_ctx(self, r, c, sub, bs, part):
        if BW[bs] < 8: return
        hbs = w4of(bs) >> 1
        splitSz = subsize(P_SPLIT, bs)
        if part == P_SPLIT and bs != SQ[8]:
            return
        if part in (P_NONE, P_HORZ, P_VERT, P_HORZ_4, P_VERT_4, P_SPLIT):
            self.update_part_ctx(r, c, sub, bs)
        elif part == P_HORZ_A:
            self.update_part_ctx(r, c, splitSz, sub)
            self.update_part_ctx(r+hbs, c, sub, sub)
        elif part == P_HORZ_B:
            self.update_part_ctx(r, c, sub, sub)
            self.update_part_ctx(r+hbs, c, splitSz, sub)
        elif part == P_VERT_A:
            self.update_part_ctx(r, c, splitSz, sub)
            self.update_part_ctx(r, c+hbs, sub, sub)
        elif part == P_VERT_B:
            self.update_part_ctx(r, c, sub, sub)
            self.update_part_ctx(r, c+hbs, splitSz, sub)

    # ---------------- block ----------------
    def is_inside(self, r, c):
        return self.tile_r0 <= r < self.tile_r1 and self.tile_c0 <= c < self.tile_c1

    def decode_block(self, r, c, bs):
        self.MiRow, self.MiCol, self.MiSize = r, c, bs
        bw4, bh4 = w4of(bs), h4of(bs)
        self.bw4, self.bh4 = bw4, bh4
        self.AvailU = self.is_inside(r-1, c)
        self.AvailL = self.is_inside(r, c-1)
        if self.seq['mono']: self.HasChroma = False
        elif bh4 == 1 and (r & 1) == 0: self.HasChroma = False
        elif bw4 == 1 and (c & 1) == 0: self.HasChroma = False
        else: self.HasChroma = not self.seq['mono']
        self.AvailUC = self.AvailU; self.AvailLC = self.AvailL
        if self.HasChroma:
            if bh4 == 1: self.AvailUC = self.is_inside(r-2, c)
            if bw4 == 1: self.AvailLC = self.is_inside(r, c-2)
        else:
            self.AvailUC = self.AvailLC = False
        rd = self.r; cdfs = self.cdfs
        # skip
        skipCtx = (self.Skips[r-1][c] if self.AvailU else 0) + \
                  (self.Skips[r][c-1] if self.AvailL else 0)
        self.Skip = rd.symbol(cdfs.Skip[skipCtx], 2)
        # y mode
        am = self.YModes[r-1][c] if self.AvailU else DC
        lm = self.YModes[r][c-1] if self.AvailL else DC
        aCtx, lCtx = INTRA_MODE_CONTEXT[am], INTRA_MODE_CONTEXT[lm]
        self.YMode = rd.symbol(cdfs.KfYMode[aCtx*5 + lCtx], 13)
        self.angleY = 0
        # spec: MiSize >= BLOCK_8X8 is an ENUM comparison -- excludes only
        # 4x4/4x8/8x4, INCLUDES the rect sizes 4x16..64x16 (enum 16..21)
        useAngle = bs >= 3
        if useAngle and self.YMode in MODE_TO_ANGLE:
            self.angleY = rd.symbol(cdfs.AngleDelta[self.YMode - V], 7) - 3
        self.UVMode = DC; self.angleUV = 0
        self.cflSigns = None
        if self.HasChroma:
            # lossless: CFL only when the chroma residual block is 4x4
            # (trace-verified against dav1d: 8x8 luma -> 14-sym cfl row,
            # 16x16 luma -> 13-sym non-cfl row)
            if self.fh.get('lossless'):
                cflAllowed = 1 if (BW[bs] >> 1 <= 4 and BH[bs] >> 1 <= 4) else 0
            else:
                cflAllowed = 1 if (BW[bs] <= 32 and BH[bs] <= 32) else 0
            self.UVMode = rd.symbol(cdfs.UvMode[cflAllowed*13 + self.YMode],
                                    14 if cflAllowed else 13)
            if self.UVMode == CFL:
                j = rd.symbol(cdfs.CflSign[0], 8)
                signU = (j + 1) // 3; signV = (j + 1) % 3
                aU = aV = 0
                if signU != 0:
                    aU = rd.symbol(cdfs.CflAlpha[j - 2], 16) + 1
                    if signU == 1: aU = -aU
                if signV != 0:
                    aV = rd.symbol(cdfs.CflAlpha[signV * 3 + signU - 3], 16) + 1
                    if signV == 1: aV = -aV
                self.cflU, self.cflV = aU, aV
            elif useAngle and self.UVMode in MODE_TO_ANGLE:
                self.angleUV = rd.symbol(cdfs.AngleDelta[self.UVMode - V], 7) - 3
        # filter intra
        self.useFilterIntra = 0; self.filterIntraMode = 0
        if (self.seq['filter_intra'] and self.YMode == DC and
                max(BW[bs], BH[bs]) <= 32):
            self.useFilterIntra = rd.symbol(cdfs.FilterIntra[bs], 2)
            if self.useFilterIntra:
                self.filterIntraMode = rd.symbol(cdfs.FilterIntraMode[0], 5)
        # record per-mi
        for y in range(bh4):
            for x in range(bw4):
                if r+y < self.MiRows and c+x < self.MiCols:
                    self.YModes[r+y][c+x] = self.YMode
                    self.UVModes[r+y][c+x] = self.UVMode
                    self.Skips[r+y][c+x] = self.Skip
        self.residual()

    # ---------------- residual ----------------
    def residual(self):
        bs = self.MiSize; bw4, bh4 = self.bw4, self.bh4
        widthChunks = max(1, BW[bs] >> 6); heightChunks = max(1, BH[bs] >> 6)
        chunkBs = 12 if (widthChunks > 1 or heightChunks > 1) else bs  # BLOCK_64X64
        for cy in range(heightChunks):
            for cx in range(widthChunks):
                nplanes = 3 if self.HasChroma else 1
                for p in range(nplanes):
                    sub = 1 if p else 0
                    planeSz = self.plane_size(chunkBs, p)
                    n4w, n4h = w4of(planeSz), h4of(planeSz)
                    # spec residual(): baseX/baseY are the BLOCK base; the
                    # chunk offset rides in the x/y txb indices so that
                    # haveLeft/haveUp (x>0 / y>0) see chunk-interior edges.
                    baseX = (self.MiCol >> sub) * 4
                    baseY = (self.MiRow >> sub) * 4
                    offX = (cx << 4) >> sub
                    offY = (cy << 4) >> sub
                    for y in range(n4h):
                        for x in range(n4w):
                            self.transform_block(p, baseX, baseY,
                                                 x + offX, y + offY)

    def plane_size(self, bs, p):
        if p == 0: return bs
        w = max(BW[bs] >> 1, 4); h = max(BH[bs] >> 1, 4)
        return find(w, h)

    def transform_block(self, p, baseX, baseY, x, y):
        sub = 1 if p else 0
        startX = baseX + 4*x; startY = baseY + 4*y
        maxX = (self.MiCols * 4) >> sub; maxY = (self.MiRows * 4) >> sub
        if startX >= maxX or startY >= maxY: return
        row = (startY << sub) >> 2; col = (startX << sub) >> 2
        sbMask = self.sbMi - 1
        sbr4 = (row & sbMask) >> sub; sbc4 = (col & sbMask) >> sub
        if p == 0:
            mode = self.YMode
        else:
            mode = DC if self.UVMode == CFL else self.UVMode
        haveLeft = (self.AvailL if p == 0 else self.AvailLC) or x > 0
        haveUp = (self.AvailU if p == 0 else self.AvailUC) or y > 0
        haveAR = self.bdget(p, sbr4 - 1, sbc4 + 1)
        haveBL = self.bdget(p, sbr4 + 1, sbc4 - 1)
        self.predict(p, startX, startY, haveLeft, haveUp, haveAR, haveBL, mode)
        if p == 0:
            self.maxLumaW = startX + 4; self.maxLumaH = startY + 4
        if not self.Skip:
            eob = self.coeffs(p, startX, startY)
            if eob > 0:
                self.reconstruct(p, startX, startY)
        else:
            x4 = startX >> 2; y4 = startY >> 2
            self.AboveLvl[p][x4] = 0; self.LeftLvl[p][y4] = 0
            self.AboveDc[p][x4] = 0; self.LeftDc[p][y4] = 0
        self.bd[p][(sbr4, sbc4)] = 1

    def coeffs(self, p, startX, startY):
        rd = self.r; cdfs = self.cdfs
        x4 = startX >> 2; y4 = startY >> 2
        ptype = 1 if p else 0
        if p == 0:
            if self.MiSize == 0:
                ctx = 0
            else:
                top = self.AboveLvl[0][x4]; left = self.LeftLvl[0][y4]
                if TSK_RULE == 'minmax':
                    ctx = SKIP_CONTEXTS[min(min(top,left),4)][min(max(top,left),4)]
                else:
                    ctx = SKIP_CONTEXTS[min(left,4)][min(top,4)]
            if TSK_FORCE_L is not None: ctx = TSK_FORCE_L
        else:
            planeSz = self.plane_size(self.MiSize, p)
            off = 7 if planeSz == 0 else 10
            ctx = (1 if self.AboveLvl[p][x4] else 0) + \
                  (1 if self.LeftLvl[p][y4] else 0) + off
            if TSK_FORCE_C is not None: ctx = TSK_FORCE_C
        allZero = rd.symbol(cdfs.TxbSkip[ctx], 2)
        if allZero:
            self.AboveLvl[p][x4] = 0; self.LeftLvl[p][y4] = 0
            self.AboveDc[p][x4] = 0; self.LeftDc[p][y4] = 0
            return 0
        eobPt = rd.symbol(cdfs.EobPt16[ptype*2 + 0], 5) + 1
        eob = eobPt if eobPt < 2 else (1 << (eobPt - 2)) + 1
        if eobPt >= 3:
            bit = rd.symbol(cdfs.EobExtra[ptype*9 + (eobPt - 3)], 2)
            if bit: eob += 1 << (eobPt - 3)
            for sh in range(eobPt - 4, -1, -1):
                if rd.bool_equi(): eob += 1 << sh
        q = [0]*16
        lv = [0]*36
        ST = 6

        def br_chain(ci, rr, cc, level):
            if BR_NSYMS == 3:
                for idx in range(BR_MAX_READS):
                    magb = min(lv[rr*ST+cc+1],15) + min(lv[(rr+1)*ST+cc],15) + \
                           min(lv[(rr+1)*ST+cc+1],15)
                    magb = min((magb + 1) >> 1, 6)
                    if BR_FORCE_CTX is not None: ctxBr = BR_FORCE_CTX
                    elif BR_DC_EXC and ci == 0: ctxBr = magb
                    elif rr < 2 and cc < 2: ctxBr = magb + 7
                    else: ctxBr = magb + 14
                    br = rd.symbol(cdfs.CoeffBr[ptype*21 + ctxBr], 3)
                    level += br
                    if br < 2: break
                return level
            for idx in range(BR_MAX_READS):
                magb = min(lv[rr*ST+cc+1],15) + min(lv[(rr+1)*ST+cc],15) + \
                       min(lv[(rr+1)*ST+cc+1],15)
                magb = min((magb + 1) >> 1, 6)
                if BR_FORCE_CTX is not None: ctxBr = BR_FORCE_CTX
                elif BR_DC_EXC and ci == 0: ctxBr = magb
                elif rr < 2 and cc < 2: ctxBr = magb + 7
                else: ctxBr = magb + 14
                if BR_AB is None:
                    br = rd.symbol(cdfs.CoeffBr[ptype*21 + ctxBr], 4)
                else:
                    br = rd.symbol_ab(cdfs.CoeffBr[ptype*21 + ctxBr], 4, BR_AB)
                level += br
                if br < 3: break
            return level

        for ci in range(eob-1, -1, -1):
            pos = SCAN4[ci]
            rr, cc = pos >> 2, pos & 3
            if ci == eob - 1:
                ctxE = 0 if ci == 0 else (1 if ci <= 2 else (2 if ci <= 4 else 3))
                if BEOB_FORCE is not None: ctxE = BEOB_FORCE
                if BEOB_AB is None:
                    level = rd.symbol(cdfs.CoeffBaseEob[ptype*4 + ctxE], 3) + 1
                else:
                    level = rd.symbol_ab(cdfs.CoeffBaseEob[ptype*4 + ctxE], 3, BEOB_AB) + 1
            elif pos == 0:
                # DC non-eob coefficient: ctx hardcoded 0 (trace-verified)
                level = rd.symbol(cdfs.CoeffBase[ptype*41], 4)
            else:
                mag = min(lv[rr*ST+cc+1],3) + min(lv[(rr+1)*ST+cc],3) + \
                      min(lv[(rr+1)*ST+cc+1],3) + min(lv[rr*ST+cc+2],3) + \
                      min(lv[(rr+2)*ST+cc],3)
                ctxB = min((mag + 1) >> 1, 4) + NZ_OFF_4x4[pos]
                if BASE_FORCE is not None: ctxB = BASE_FORCE
                level = rd.symbol(cdfs.CoeffBase[ptype*41 + ctxB], 4)
            if COEF_STRUCT == 'inter' and level > 2:
                level = br_chain(ci, rr, cc, level)
            lv[rr*ST+cc] = min(level, LV_CAP)
            q[pos] = level

        cul = 0
        dcCat = 0
        for ci in range(eob):
            pos = SCAN4[ci]
            rr, cc = pos >> 2, pos & 3
            level = q[pos]
            def read_sign():
                if ci == 0:
                    a = self.AboveDc[p][x4]; l = self.LeftDc[p][y4]
                    dcSum = (1 if a == 2 else (-1 if a == 1 else 0)) + \
                            (1 if l == 2 else (-1 if l == 1 else 0))
                    sctx = 0 if dcSum == 0 else (1 if dcSum < 0 else 2)
                    return rd.symbol(cdfs.DcSign[ptype*3 + sctx], 2)
                return rd.bool_equi()
            sign = 0
            if COEF_STRUCT == 'br_sign':
                if level > 2 and COEF_STRUCT != 'inter':
                    level = br_chain(ci, rr, cc, level)
                if q[pos] != 0: sign = read_sign()
            else:
                if q[pos] != 0: sign = read_sign()
                if COEF_STRUCT == 'sign_br' and level > 2:
                    level = br_chain(ci, rr, cc, level)
            if level > 2 + (3 if BR_NSYMS == 4 else 2)*BR_MAX_READS:
                level += rd.golomb()
            q[pos] = level
            cul += level
            if ci == 0 and level > 0:
                dcCat = 1 if sign else 2
            if sign: q[pos] = -q[pos]
        cul = min(cul, 63)
        self.q = q
        self.AboveLvl[p][x4] = cul; self.LeftLvl[p][y4] = cul
        self.AboveDc[p][x4] = dcCat; self.LeftDc[p][y4] = dcCat
        return eob

    def reconstruct(self, p, startX, startY):
        # lossless: dequant by 4, iWHT with >>2
        d = [v * 4 for v in self.q]
        # 1D inverse WHT rows then cols (vpx iwht4x4_16)
        out = [0]*16
        for i in range(4):
            a1 = d[i*4+0] >> 2; c1 = d[i*4+1] >> 2
            d1 = d[i*4+2] >> 2; b1 = d[i*4+3] >> 2
            a1 += c1; d1 -= b1
            e1 = (a1 - d1) >> 1
            b1 = e1 - b1; c1 = e1 - c1
            a1 -= b1; d1 += c1
            out[i*4+0]=a1; out[i*4+1]=b1; out[i*4+2]=c1; out[i*4+3]=d1
        pl = self.plane[p]
        for j in range(4):
            a1 = out[0*4+j]; c1 = out[1*4+j]; d1 = out[2*4+j]; b1 = out[3*4+j]
            a1 += c1; d1 -= b1
            e1 = (a1 - d1) >> 1
            b1 = e1 - b1; c1 = e1 - c1
            a1 -= b1; d1 += c1
            for i, v in enumerate((a1, b1, c1, d1)):
                yy = startY + i; xx = startX + j
                if yy < self.planeH[p] and xx < self.planeW[p]:
                    pl[yy][xx] = max(0, min(255, pl[yy][xx] + v))

    # ---------------- prediction ----------------
    def predict(self, p, x, y, haveLeft, haveUp, haveAR, haveBL, mode):
        w = h = 4
        pl = self.plane[p]
        maxX = self.planeW[p] - 1; maxY = self.planeH[p] - 1
        base = 128
        above = [0]*17  # index i+1 => aboveRow[i], [0] = corner
        left = [0]*17
        if haveUp:
            lim = 2*w if haveAR else w
            for i in range(2*w):
                above[i+1] = pl[y-1][min(x + min(i, lim-1), maxX)]
        elif haveLeft:
            v = pl[y][x-1]
            for i in range(2*w): above[i+1] = v
        else:
            for i in range(2*w): above[i+1] = base - 1
        if haveLeft:
            lim = 2*h if haveBL else h
            for i in range(2*h):
                left[i+1] = pl[min(y + min(i, lim-1), maxY)][x-1]
        elif haveUp:
            v = pl[y-1][x]
            for i in range(2*h): left[i+1] = v
        else:
            for i in range(2*h): left[i+1] = base + 1
        if haveUp and haveLeft: corner = pl[y-1][x-1]
        elif haveUp: corner = pl[y-1][x]
        elif haveLeft: corner = pl[y][x-1]
        else: corner = base
        above[0] = corner; left[0] = corner

        pred = [[0]*w for _ in range(h)]
        if p == 0 and self.useFilterIntra:
            self.filter_intra_pred(pred, above, left, w, h)
        elif mode in MODE_TO_ANGLE:
            pAngle = MODE_TO_ANGLE[mode] + (self.angleY if p == 0 else self.angleUV) * 3
            upA = upL = 0
            if self.seq['intra_edge'] and pAngle != 90 and pAngle != 180:
                ft = self.filt_type(p)
                if pAngle > 90 and pAngle < 180 and (w + h) >= 24:
                    s = (left[1]*5 + above[0]*6 + above[1]*5 + 8) >> 4
                    above[0] = left[0] = s
                if haveUp:
                    st = edge_strength(w, h, ft, pAngle - 90)
                    numPx = min(w, maxX - x + 1) + (h if pAngle < 90 else 0) + 1
                    edge_filter(above, numPx, st)
                if haveLeft:
                    st = edge_strength(w, h, ft, pAngle - 180)
                    numPx = min(h, maxY - y + 1) + (w if pAngle > 180 else 0) + 1
                    edge_filter(left, numPx, st)
                upA = use_upsample(w, h, ft, pAngle - 90)
                if upA:
                    numPx = w + (h if pAngle < 90 else 0)
                    above = edge_upsample(above, numPx)
                upL = use_upsample(w, h, ft, pAngle - 180)
                if upL:
                    numPx = h + (w if pAngle > 180 else 0)
                    left = edge_upsample(left, numPx)
            self.dir_pred(pred, above, left, w, h, pAngle, upA, upL,
                          2 if upA else 1, 2 if upL else 1)
        elif mode == DC:
            if haveUp and haveLeft:
                s = sum(above[1:1+w]) + sum(left[1:1+h])
                v = (s + ((w + h) >> 1)) // (w + h)
            elif haveUp: v = (sum(above[1:1+w]) + (w>>1)) >> 2
            elif haveLeft: v = (sum(left[1:1+h]) + (h>>1)) >> 2
            else: v = base
            for i in range(h):
                for j in range(w): pred[i][j] = v
        elif mode == PAETH:
            for i in range(h):
                for j in range(w):
                    b = above[1+j] + left[1+i] - corner
                    pa = abs(b - left[1+i]); pb = abs(b - above[1+j]); pc = abs(b - corner)
                    if pa <= pb and pa <= pc: pred[i][j] = left[1+i]
                    elif pb <= pc: pred[i][j] = above[1+j]
                    else: pred[i][j] = corner
        elif mode in (SMOOTH, SMOOTH_V, SMOOTH_H):
            wts = SMW[0:4]  # size-4 weights
            for i in range(h):
                for j in range(w):
                    if mode == SMOOTH:
                        s = (wts[i]*above[1+j] + (256-wts[i])*left[1+h-1] +
                             wts[j]*left[1+i] + (256-wts[j])*above[1+w-1])
                        pred[i][j] = (s + 256) >> 9
                    elif mode == SMOOTH_V:
                        s = wts[i]*above[1+j] + (256-wts[i])*left[1+h-1]
                        pred[i][j] = (s + 128) >> 8
                    else:
                        s = wts[j]*left[1+i] + (256-wts[j])*above[1+w-1]
                        pred[i][j] = (s + 128) >> 8
        else:
            raise ValueError(mode)
        # CFL overlay
        if p > 0 and self.UVMode == CFL:
            self.cfl_adjust(pred, x, y, self.cflU if p == 1 else self.cflV)
        for i in range(h):
            for j in range(w):
                if y+i <= maxY and x+j <= maxX:
                    pl[y+i][x+j] = max(0, min(255, pred[i][j]))

    def filt_type(self, p):
        r, c = self.MiRow, self.MiCol
        def smooth(m): return m in (SMOOTH, SMOOTH_V, SMOOTH_H)
        a = l = False
        if p == 0:
            if self.AvailU: a = smooth(self.YModes[r-1][c])
            if self.AvailL: l = smooth(self.YModes[r][c-1])
        else:
            if self.AvailUC: a = smooth(self.UVModes[r-1][c])
            if self.AvailLC: l = smooth(self.UVModes[r][c-1])
        return 1 if (a or l) else 0

    def dir_pred(self, pred, above, left, w, h, pAngle, upA, upL, oA=1, oL=1):
        if pAngle == 90:
            for i in range(h):
                for j in range(w): pred[i][j] = above[oA+j]
            return
        if pAngle == 180:
            for i in range(h):
                for j in range(w): pred[i][j] = left[oL+i]
            return
        if pAngle < 90:
            dx = DRV[pAngle]
            maxBaseX = (w + h - 1) << upA
            for i in range(h):
                for j in range(w):
                    idx = (i + 1) * dx
                    b = (idx >> (6 - upA)) + (j << upA)
                    sh = ((idx << upA) >> 1) & 0x1F
                    if b < maxBaseX:
                        pred[i][j] = (above[oA+b]*(32-sh) + above[oA+1+b]*sh + 16) >> 5
                    else:
                        pred[i][j] = above[oA+maxBaseX]
        elif pAngle < 180:
            dx = DRV[180 - pAngle]; dy = DRV[pAngle - 90]
            for i in range(h):
                for j in range(w):
                    idx = (j << 6) - (i + 1) * dx
                    b = idx >> (6 - upA)
                    if b >= -(1 << upA):
                        sh = ((idx << upA) >> 1) & 0x1F
                        pred[i][j] = (above[oA+b]*(32-sh) + above[oA+1+b]*sh + 16) >> 5
                    else:
                        idx2 = (i << 6) - (j + 1) * dy
                        b2 = idx2 >> (6 - upL)
                        sh2 = ((idx2 << upL) >> 1) & 0x1F
                        pred[i][j] = (left[oL+b2]*(32-sh2) + left[oL+1+b2]*sh2 + 16) >> 5
        else:
            dy = DRV[270 - pAngle]
            maxBaseY = (w + h - 1) << upL
            for i in range(h):
                for j in range(w):
                    idx = (j + 1) * dy
                    b = (idx >> (6 - upL)) + (i << upL)
                    sh = ((idx << upL) >> 1) & 0x1F
                    if b < maxBaseY:
                        pred[i][j] = (left[oL+b]*(32-sh) + left[oL+1+b]*sh + 16) >> 5
                    else:
                        pred[i][j] = left[oL+maxBaseY]

    def filter_intra_pred(self, pred, above, left, w, h):
        m = self.filterIntraMode
        buf = [[0]*(w+1) for _ in range(h+1)]
        buf[0] = [above[i] for i in range(0, w+1)]
        for i in range(1, h+1): buf[i][0] = left[i]
        for i2 in range(1, h+1, 2):
            for j2 in range(1, w+1, 4):
                p_ = [buf[i2-1][j2-1]] + [buf[i2-1][j2+k] for k in range(4)] + \
                     [buf[i2][j2-1], buf[i2+1][j2-1]]
                for r_ in range(8):
                    taps = FIT[m*64 + r_*8: m*64 + r_*8 + 7]
                    s = sum(t*pv for t, pv in zip(taps, p_))
                    v = max(0, min(255, (s + 8) >> 4))
                    buf[i2 + (r_ >> 2)][j2 + (r_ & 3)] = v
        for i in range(h):
            for j in range(w): pred[i][j] = buf[i+1][j+1]

    def cfl_adjust(self, pred, x, y, alpha):
        # spec 7.11.5: luma AC in Q3 from reconstructed luma
        w = h = 4
        Y = self.plane[0]
        mw = getattr(self, 'maxLumaW', self.planeW[0])
        mh = getattr(self, 'maxLumaH', self.planeH[0])
        L = [[0]*w for _ in range(h)]
        s = 0
        for i in range(h):
            ly = min((y + i) << 1, mh - 2)
            for j in range(w):
                lx = min((x + j) << 1, mw - 2)
                t = Y[ly][lx] + Y[ly][lx+1] + Y[ly+1][lx] + Y[ly+1][lx+1]
                L[i][j] = t << 1
                s += L[i][j]
        avg = (s + 8) >> 4
        for i in range(h):
            for j in range(w):
                d = alpha * (L[i][j] - avg)
                r2 = (abs(d) + 32) >> 6
                pred[i][j] = pred[i][j] + (r2 if d >= 0 else -r2)


def edge_strength(w, h, ft, delta):
    d = abs(delta)
    blkWh = w + h
    s = 0
    if ft == 0:
        if blkWh <= 8:
            if d >= 56: s = 1
        elif blkWh <= 12:
            if d >= 40: s = 1
        elif blkWh <= 16:
            if d >= 40: s = 1
        elif blkWh <= 24:
            if d >= 8: s = 1
            if d >= 16: s = 2
            if d >= 32: s = 3
        elif blkWh <= 32:
            if d >= 1: s = 3
        else:
            if d >= 1: s = 3
    else:
        if blkWh <= 8:
            if d >= 40: s = 1
            if d >= 64: s = 2
        elif blkWh <= 16:
            if d >= 20: s = 1
            if d >= 48: s = 2
        elif blkWh <= 24:
            if d >= 4: s = 3
        else:
            if d >= 1: s = 3
    return s

EDGE_KERNEL = [[0,4,8,4,0],[0,5,6,5,0],[2,4,4,4,2]]

def edge_filter(buf, sz, strength):
    """buf[0] is edge[-1]; filters sz entries starting there (spec 7.11.2.?)"""
    if strength == 0: return
    edge = buf[0:sz]
    for i in range(1, sz):
        s = 0
        for j in range(5):
            k = max(0, min(sz - 1, i - 2 + j))
            s += EDGE_KERNEL[strength - 1][j] * edge[k]
        buf[i] = (s + 8) >> 4

def use_upsample(w, h, ft, delta):
    d = abs(delta)
    blkWh = w + h
    if d <= 0 or d >= 40: return 0
    return 1 if (blkWh <= 16 if ft == 0 else blkWh <= 8) else 0

def edge_upsample(buf, numPx):
    """buf[0]=edge[-1], buf[1..]=edge[0..]; returns new buffer in upsampled
    indexing: out[0]=edge[-1? ...]. We return arr where arr[k] = edge[k-1]
    semantics preserved: caller indexes above[1+base] with doubled base."""
    dup = [buf[0], buf[0]] + [buf[1 + i] for i in range(numPx)] + [buf[numPx]]
    # output spans edge[-2 .. 2*numPx-2]; we keep same access convention:
    # new[1 + t] = upsampled edge[t] for t in -1? spec writes buf[2i-2? ]
    out = [0] * (2 * numPx + 2)
    out[0] = dup[0]  # edge[-2] = original edge[-1]
    for i in range(numPx):
        ss = -dup[i] + 9*dup[i+1] + 9*dup[i+2] - dup[i+3]
        ss = max(0, min(255, (ss + 8) >> 4))
        out[2*i + 1] = ss
        out[2*i + 2] = dup[i + 2]
    return out


class EncDriver:
    """Msac-interface shim that ENCODES a scripted symbol-value list through
    the decoder's own context machinery (rows chosen by Dec logic)."""
    def __init__(self, values):
        from enc import EncMsac
        self.e = EncMsac()
        self.vals = list(values)
        self.log = []
    def _next(self):
        return self.vals.pop(0) if self.vals else 0
    def symbol(self, cdf, nsyms):
        v = self._next()
        self.log.append(('sym', nsyms, v))
        self.e.symbol(cdf, nsyms, v)
        return v
    def symbol_ab(self, cdf, nsyms, ab):
        # encoder side mirrors the AB-variant boundaries
        v = self._next()
        self.log.append(('symab', nsyms, v))
        A, B = ab
        r = self.e.rng
        AB3 = (A, B) if not isinstance((A,B), tuple) else None
        def bound(k):
            if k < 0: return r
            s = ((r >> 8) * (cdf[k] >> 6)) >> 1
            return s + max(A + B*k, 0)
        u = bound(v-1); w = bound(v)
        if v > 0:
            self.e.low += r - u
            self.e.rng = u - w
        else:
            self.e.rng = r - w
        self.e._normalize()
        cnt = cdf[nsyms]
        rate = 3 + (cnt > 15) + (cnt > 31) + (1 if nsyms <= 3 else 2)
        for i in range(nsyms - 1):
            tmp = 0 if i >= v else 32768
            if tmp < cdf[i]:
                cdf[i] -= (cdf[i] - tmp) >> rate
            else:
                cdf[i] += (tmp - cdf[i]) >> rate
        cdf[nsyms] = cnt + (cnt < 32)
        return v
    def decode(self, icdf, nsyms):
        v = self._next()
        self.log.append(('raw', nsyms, v))
        self.e.encode(icdf, nsyms, v)
        return v
    def bool_equi(self):
        v = self._next()
        self.log.append(('bool', v))
        self.e.bool_equi(v)
        return v
    def golomb(self):
        v = self._next()
        self.log.append(('golomb', v))
        self.e.golomb(v)
        return v
    def literal(self, n):
        v = self._next()
        self.e.literal(n, v)
        return v
    def done(self):
        return self.e.done()


def craft_frame(w, h, values, seq_kw=None):
    """encode a frame from scripted symbol values via Dec's own logic;
    returns (stream_bytes, mypixels) where mypixels is the decode of the
    produced stream by Dec."""
    from enc import stream
    drv = EncDriver(values)
    blank = stream(w, h, b'\x00' * 64, **(seq_kw or {}))
    d = Dec(blank)
    d.r = drv
    fh = d.fh
    for sr in range(0, d.MiRows, d.sbMi):
        for p in range(3):
            for i in range(len(d.LeftLvl[p])): d.LeftLvl[p][i]=0; d.LeftDc[p][i]=0
        d.LeftPart = [0]*32
        for sc in range(0, d.MiCols, d.sbMi):
            d.clear_block_decoded(sr, sc)
            d.decode_partition(sr, sc, d.sbBs)
    return stream(w, h, drv.done(), **(seq_kw or {})), drv.log
