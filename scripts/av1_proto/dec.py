"""AV1 lossless-keyframe prototype decoder (spec-order reference for the
Scala port). Scope: profile 0, 8-bit 4:2:0, CodedLossless, intra only."""
import sys
from msac import Msac, cdf_rows, T

# ---- block sizes (BLOCK_SIZES_ALL order) ----
BW = [4,4,8,8,8,16,16,16,32,32,32,64,64,64,128,128, 4,16, 8,32,16,64]
BH = [4,8,4,8,16,8,16,32,16,32,64,32,64,128,64,128, 16,4,32, 8,64,16]
# spec order: 0 4x4,1 4x8,2 8x4,3 8x8,4 8x16,5 16x8,6 16x16,7 16x32,8 32x16,
# 9 32x32,10 32x64,11 64x32,12 64x64,13 64x128,14 128x64,15 128x128,
# 16 4x16,17 16x4,18 8x32,19 32x8,20 16x64,21 64x16
SQ = {4:0, 8:3, 16:6, 32:9, 64:12, 128:15}  # square bsize by px

def bsize_wh(bs): return BW[bs], BH[bs]
def w4of(bs): return BW[bs] >> 2
def h4of(bs): return BH[bs] >> 2

# partition types
P_NONE,P_HORZ,P_VERT,P_SPLIT,P_HORZ_A,P_HORZ_B,P_VERT_A,P_VERT_B,P_HORZ_4,P_VERT_4 = range(10)

def subsize(part, bs):
    w, h = BW[bs], BH[bs]
    if part == P_NONE: return bs
    if part == P_HORZ or part == P_HORZ_A or part == P_HORZ_B: return find(w, h//2)
    if part == P_VERT or part == P_VERT_A or part == P_VERT_B: return find(w//2, h)
    if part == P_SPLIT: return find(w//2, h//2)
    if part == P_HORZ_4: return find(w, h//4)
    if part == P_VERT_4: return find(w//4, h)

def find(w, h):
    for i in range(22):
        if BW[i] == w and BH[i] == h: return i
    raise ValueError((w,h))

# intra modes
DC,V,H,D45,D135,D113,D157,D203,D67,SMOOTH,SMOOTH_V,SMOOTH_H,PAETH = range(13)
CFL = 13
MODE_TO_ANGLE = {V:90, H:180, D45:45, D135:135, D113:113, D157:157, D203:203, D67:67}
INTRA_MODE_CONTEXT = [0,1,2,3,4,4,4,4,3,0,1,2,0]

class BitR:
    def __init__(s, b, pos=0):
        s.b = b; s.pos = pos
    def f(s, n):
        v = 0
        for _ in range(n):
            v = (v<<1) | ((s.b[s.pos>>3] >> (7-(s.pos&7))) & 1)
            s.pos += 1
        return v

def parse_obus(data):
    """returns (seq, frame_header_dict, tile_bytes)"""
    p = 0; seq = None; out = None
    while p < len(data):
        hdr = data[p]; obu_type = (hdr>>3)&0xF
        q = p+1
        if (hdr>>2)&1: q += 1
        if (hdr>>1)&1:
            sz = 0; sh = 0
            while True:
                x = data[q]; q += 1; sz |= (x&0x7F)<<sh; sh += 7
                if not x&0x80: break
        else:
            sz = len(data)-q
        body = data[q:q+sz]; p = q+sz
        if obu_type == 1: seq = parse_seq(body)
        elif obu_type == 6 and out is None:
            out = parse_frame(body, seq)
    fh, tiles = out
    return seq, fh, tiles

def parse_seq(b):
    r = BitR(b); s = {}
    s['profile'] = r.f(3); r.f(1)
    red = r.f(1); s['reduced'] = red
    if red: s['level'] = r.f(5)
    else:
        assert r.f(1)==0; idd=r.f(1); n=r.f(5)
        for i in range(n+1):
            r.f(12); lvl=r.f(5)
            if lvl>7: r.f(1)
            assert not idd
    wb=r.f(4)+1; hb=r.f(4)+1
    s['w']=r.f(wb)+1; s['h']=r.f(hb)+1
    if not red:
        if r.f(1): r.f(4); r.f(3); s['frame_ids']=1
    s['use128'] = r.f(1)
    s['filter_intra'] = r.f(1)
    s['intra_edge'] = r.f(1)
    if red:
        s['force_scr'] = 2; s['force_imv'] = 2
    else:
        r.f(1);r.f(1);r.f(1);r.f(1)
        s['order_hint']=r.f(1)
        assert s['order_hint']==0  # stills only in scope
        s['force_scr'] = 2 if r.f(1) else r.f(1)
        if s['force_scr'] > 0: s['force_imv'] = 2 if r.f(1) else r.f(1)
        else: s['force_imv'] = 2
    s['superres']=r.f(1); s['cdef']=r.f(1); s['restoration']=r.f(1)
    hbd = r.f(1); assert hbd==0 and s['profile']==0
    s['mono'] = r.f(1)
    if r.f(1): r.f(8);r.f(8);r.f(8)
    if s['mono']: r.f(1)
    else:
        r.f(1)  # color_range
        r.f(2)  # chroma_sample_position (420 profile0)
        r.f(1)  # separate_uv_delta_q
    assert r.f(1)==0  # film grain
    return s

def parse_frame(b, seq):
    r = BitR(b); fh = {}
    if seq['reduced']:
        fh['frame_type']=0; fh['show']=1; fh['error_res']=0
    else:
        assert r.f(1)==0  # show_existing
        fh['frame_type']=r.f(2); fh['show']=r.f(1)
        if not fh['show']: r.f(1)
        assert fh['frame_type']==0
        fh['error_res'] = r.f(1) if not fh['show'] else 1
        # for KEY+show: error_resilient read? spec: KEY&&show -> error_res read!
    fh['disable_cdf_update'] = r.f(1)
    fh['allow_scr'] = r.f(1) if seq['force_scr']==2 else seq['force_scr']
    if fh['allow_scr'] and seq['force_imv']==2: r.f(1)
    if not seq['reduced']:
        fh['size_override'] = r.f(1); assert fh['size_override']==0
    fh['w'], fh['h'] = seq['w'], seq['h']
    if seq['superres']: assert False
    if r.f(1): r.f(16); r.f(16)  # render size
    if fh['allow_scr']:
        fh['allow_intrabc'] = r.f(1)
        assert fh['allow_intrabc']==0, 'intrabc unsupported'
    # tile info
    sbShift = 5 if seq['use128'] else 4   # SB size in MI units = 1<<sbShift
    sbSz = 128 if seq['use128'] else 64
    MiCols = 2*((fh['w']+7)>>3); MiRows = 2*((fh['h']+7)>>3)
    sbCols = (MiCols + (1<<sbShift) - 1) >> sbShift
    sbRows = (MiRows + (1<<sbShift) - 1) >> sbShift
    fh['MiCols'], fh['MiRows'] = MiCols, MiRows
    uniform = r.f(1); assert uniform==1
    # uniform tile spacing
    maxLog2Cols = tile_log2(1, min(sbCols, 64))
    maxLog2Rows = tile_log2(1, min(sbRows, 64))
    maxTileAreaSb = (4096*2304) // (sbSz*sbSz)
    minLog2Tiles = max(tile_log2(64, fh['w']//1), 0)  # MAX_TILE_WIDTH=4096: tile_log2(4096? )
    # spec: minLog2TileCols = tile_log2(MAX_TILE_WIDTH_SB(=4096>>sbShift? ), sbCols)
    maxTileWidthSb = 4096 // sbSz
    minLog2Cols = tile_log2(maxTileWidthSb, sbCols)
    minLog2Tiles = max(minLog2Cols, tile_log2(maxTileAreaSb, sbRows*sbCols))
    tcl = minLog2Cols
    while tcl < maxLog2Cols:
        if r.f(1): tcl += 1
        else: break
    minLog2Rows = max(minLog2Tiles - tcl, 0)
    trl = minLog2Rows
    while trl < maxLog2Rows:
        if r.f(1): trl += 1
        else: break
    fh['tileColsLog2'], fh['tileRowsLog2'] = tcl, trl
    tileCols = []; tileRows = []
    i = 0
    while i < sbCols:
        tileCols.append(i); i += max(sbCols >> tcl, 1)
    i = 0
    while i < sbRows:
        tileRows.append(i); i += max(sbRows >> trl, 1)
    # spec uniform: sizeSb = (sbCols + (1<<tcl) - 1) >> tcl; starts every sizeSb
    tileCols = list(range(0, sbCols, (sbCols + (1<<tcl) - 1) >> tcl))
    tileRows = list(range(0, sbRows, (sbRows + (1<<trl) - 1) >> trl))
    fh['tileCols'], fh['tileRows'] = tileCols, tileRows
    fh['sbCols'], fh['sbRows'], fh['sbSz'] = sbCols, sbRows, sbSz
    if tcl > 0 or trl > 0:
        r.f(tcl + trl)            # context_update_tile_id
        fh['tileSzBytes'] = r.f(2) + 1
    else:
        fh['tileSzBytes'] = 1
    # quantization
    fh['base_q'] = r.f(8)
    def dq():
        if r.f(1):
            v = r.f(6); s_ = r.f(1)
            return v - 64 if s_ else v
        return 0
    fh['dqy'] = dq()
    if not seq['mono']:
        fh['dqu_dc'] = dq(); fh['dqu_ac'] = dq()
    assert r.f(1)==0  # using_qmatrix
    assert r.f(1)==0  # segmentation
    if fh['base_q'] > 0:
        fh['delta_q'] = r.f(1); assert fh['delta_q']==0
    lossless = fh['base_q']==0 and fh['dqy']==0 and fh.get('dqu_dc',0)==0 and fh.get('dqu_ac',0)==0
    assert lossless, 'only lossless in scope'
    fh['lossless'] = True
    # CodedLossless -> no loop filter/cdef/lr/tx_mode bits
    if not fh['lossless']: assert False
    # delta_lf: only if delta_q_present -> none
    fh['reduced_tx_set'] = r.f(1)
    # tile data at byte-aligned
    pos = (r.pos + 7) & ~7
    return fh, b[pos>>3:]

def tile_log2(blkSize, target):
    k = 0
    while (blkSize << k) < target: k += 1
    return k
