import sys, os
sys.path.insert(0, '/tmp/av1p')
from tile import Dec

GD = '/root/repo/data/av1_golden'
index = [l.split(',') for l in open(GD + '/index.txt').read().strip().split('\n')]

def check(name, w, h, verbose=True):
    data = open(f'{GD}/{name}.obu', 'rb').read()
    d = Dec(data)
    d.decode_frame()
    raw = open(f'{GD}/{name}.yuv', 'rb').read()
    cw, ch = (w + 1)//2, (h + 1)//2
    exp_y = raw[:w*h]
    exp_u = raw[w*h:w*h+cw*ch]
    exp_v = raw[w*h+cw*ch:]
    bad = 0; first = None
    for i in range(h):
        for j in range(w):
            if d.plane[0][i][j] != exp_y[i*w+j]:
                bad += 1
                if first is None: first = ('Y', i, j, d.plane[0][i][j], exp_y[i*w+j])
    for pi, exp in ((1, exp_u), (2, exp_v)):
        for i in range(ch):
            for j in range(cw):
                if d.plane[pi][i][j] != exp[i*cw+j]:
                    bad += 1
                    if first is None: first = ('UV'[pi-1], i, j, d.plane[pi][i][j], exp[i*cw+j])
    tot = w*h + 2*cw*ch
    print(f"{name}: {'OK' if bad==0 else f'{bad}/{tot} mismatch, first={first}'}")
    return bad == 0, d

if __name__ == '__main__':
    names = sys.argv[1:] or [r[0] for r in index]
    for row in index:
        if row[0] in names:
            try:
                check(row[0], int(row[1]), int(row[2]))
            except Exception as e:
                import traceback
                print(row[0], 'EXC', repr(e))
                traceback.print_exc()
