import sys
sys.path.insert(0,'/tmp/av1p')
exec(open('/tmp/av1p/xcheck.py').read().split("def craft_skip8")[0])
from msac import cdf_rows
import tile as _t

def scan_rows(seq, scan_idx, nrows, w=8, h=8):
    """seq: list of (name,row,nsyms,s). The entry at scan_idx has its row
    scanned 0..nrows-1; returns the row indices where dav1d matches my
    decoder (my decoder patched by swapping rows so ITS ctx choice is
    irrelevant: both sides use the swapped row)."""
    name, guess, nsyms, s = seq[scan_idx]
    hits = []
    for ri in range(nrows):
        e = EncMsac(); tabs = {}
        for j, it in enumerate(seq):
            if it[0]=='bool': e.bool_equi(it[1]); continue
            if it[0]=='golomb': e.golomb(it[1]); continue
            nm, row, ns, sy = it
            if nm not in tabs: tabs[nm] = cdf_rows(nm)
            if j == scan_idx: row = ri
            e.symbol(tabs[nm][row], ns, sy)
        st = stream(w, h, e.done())
        d = _t.Dec(st)
        tab = getattr(d.cdfs, name)
        if guess != ri:
            tab[guess], tab[ri] = tab[ri], tab[guess]
        d.decode_frame()
        mine = bytearray()
        for i in range(h): mine += bytes(d.plane[0][i][:w])
        for p in (1,2):
            for i in range(h//2): mine += bytes(d.plane[p][i][:w//2])
        r = dav1d_decode(st, w, h)
        if bytes(mine) == r: hits.append(ri)
    return hits

PRE = [('Partition',0,4,0), ('Skip',0,2,0), ('KfYMode',0,13,0),
       ('UvMode',13,14,0), ('FilterIntra',3,2,0), ('TxbSkip',1,2,0)]
TAIL = [('TxbSkip',3,2,1), ('TxbSkip',3,2,1), ('TxbSkip',1,2,1),
        ('TxbSkip',7,2,1), ('TxbSkip',7,2,1)]

if __name__ == '__main__':
    # P2b: eob=2; eobcoeff(pos=scan[1]) level 1; DC level 4 => br read at DC (non-eob)
    seq = PRE + [('EobPt16',0,5,1), ('CoeffBaseEob',1,3,0),
                 ('CoeffBase',1,4,3), ('CoeffBr',0,4,1),
                 ('DcSign',0,2,0), ('bool',0)] + TAIL
    print('DC non-eob br row:', scan_rows(seq, len(PRE)+3, 84))

def hillclimb(seq, scan_specs, w=8, h=8, rounds=3):
    """scan_specs: list of (seq_index, nrows). Iteratively scan each position
    keeping others at current guess; update to first hit; repeat."""
    seq = [list(it) if it[0] not in ('bool','golomb') else it for it in seq]
    for rnd in range(rounds):
        changed = False
        for si, nrows in scan_specs:
            cur = [tuple(it) if isinstance(it, list) else it for it in seq]
            hits = scan_rows(cur, si, nrows, w, h)
            if hits and seq[si][1] != hits[0]:
                print(f'  round {rnd}: seq[{si}] {seq[si][0]} row {seq[si][1]} -> {hits}')
                seq[si][1] = hits[0]
                changed = True
            elif hits:
                print(f'  round {rnd}: seq[{si}] {seq[si][0]} confirmed {hits}')
        if not changed and rnd > 0: break
    return seq
