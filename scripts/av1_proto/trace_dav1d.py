"""ptrace-based tracer: breakpoints dav1d's internal msac readers and logs
(callsite, cdf ptr, cdf[0..n], result) for every symbol read of one decode.

Usage: python3 trace_dav1d.py <stream.bin> <w> <h>
Runs the dav1d decode in a CHILD process under PTRACE_TRACEME; parent pokes
int3 at the msac helper entries + their return, single-steps to harvest args
and return values.
"""
import ctypes, ctypes.util, os, sys, struct, signal

libc = ctypes.CDLL(None, use_errno=True)
PTRACE_TRACEME = 0
PTRACE_PEEKTEXT = 1
PTRACE_POKETEXT = 4
PTRACE_CONT = 7
PTRACE_SINGLESTEP = 9
PTRACE_GETREGS = 12
PTRACE_SETREGS = 13
PTRACE_ATTACH = 16
PTRACE_DETACH = 17

class user_regs_struct(ctypes.Structure):
    _fields_ = [(n, ctypes.c_ulonglong) for n in (
        'r15','r14','r13','r12','rbp','rbx','r11','r10','r9','r8','rax','rcx',
        'rdx','rsi','rdi','orig_rax','rip','cs','eflags','rsp','ss',
        'fs_base','gs_base','ds','es','fs','gs')]

libc.ptrace.restype = ctypes.c_long
libc.ptrace.argtypes = [ctypes.c_long]*4

def ptrace(req, pid, addr, data):
    ctypes.set_errno(0)
    r = libc.ptrace(req, pid, addr, data)
    if r == -1 and ctypes.get_errno() != 0:
        raise OSError(ctypes.get_errno(), 'ptrace req=%d' % req)
    return r

def peek(pid, addr):
    return ptrace(PTRACE_PEEKTEXT, pid, addr, 0) & 0xFFFFFFFFFFFFFFFF

def poke(pid, addr, val):
    ptrace(PTRACE_POKETEXT, pid, addr, val)

def getregs(pid):
    regs = user_regs_struct()
    ptrace(PTRACE_GETREGS, pid, 0, ctypes.addressof(regs))
    return regs

def setregs(pid, regs):
    ptrace(PTRACE_SETREGS, pid, 0, ctypes.addressof(regs))

def read_mem(pid, addr, n):
    out = b''
    a = addr & ~7
    while len(out) < (addr - a) + n:
        out += struct.pack('<Q', peek(pid, a + len(out)))
    s = addr - a
    return out[s:s+n]

# --------------- child ---------------
def child(streamfile, w, h):
    ptrace(PTRACE_TRACEME, 0, 0, 0)
    os.kill(os.getpid(), signal.SIGSTOP)
    DAV = ctypes.CDLL("libdav1d.so.6")
    DAV.dav1d_default_settings.argtypes = [ctypes.c_char_p]
    DAV.dav1d_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    DAV.dav1d_open.restype = ctypes.c_int
    FREECB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p)
    _free_cb = FREECB(lambda a, b: None)
    DAV.dav1d_data_wrap.restype = ctypes.c_int
    DAV.dav1d_data_wrap.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_size_t, FREECB, ctypes.c_void_p]
    DAV.dav1d_send_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    DAV.dav1d_get_picture.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    st = ctypes.create_string_buffer(256)
    DAV.dav1d_default_settings(st)
    # single-thread to keep ptrace simple
    # Dav1dSettings: int n_threads at offset 0
    struct.pack_into('<i', st, 0, 1)
    ctxp = ctypes.c_void_p(None)
    assert DAV.dav1d_open(ctypes.byref(ctxp), st) == 0
    obu = open(streamfile,'rb').read()
    data = ctypes.create_string_buffer(128)
    payload = ctypes.create_string_buffer(obu, len(obu))
    assert DAV.dav1d_data_wrap(data, payload, len(obu), _free_cb, None) == 0
    # breakpoint sync point: signal parent we are about to decode
    os.kill(os.getpid(), signal.SIGSTOP)
    DAV.dav1d_send_data(ctxp, data)
    pic = ctypes.create_string_buffer(512)
    rc = DAV.dav1d_get_picture(ctxp, pic)
    if rc != 0: rc = DAV.dav1d_get_picture(ctxp, pic)
    os._exit(0 if rc == 0 else 1)

# offsets of interesting function entries inside libdav1d (from objdump)
FUNCS = {
    0x12480: ('bool_adapt', 1),    # rsi = cdf (2 u16)
    0x12160: ('symbol_adapt', None),  # rsi=cdf, rdx=n_symbols(n-1)
    0x12500: ('bool_equi', 0),
    0x12580: ('hi_tok', 4),        # rsi = cdf (br row)
    0x122b0: ('helper_122b0', 4),
    0x124f8: ('pad', None),
}

def main():
    streamfile, w, h = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    pid = os.fork()
    if pid == 0:
        child(streamfile, w, h)
        return
    # parent
    os.waitpid(pid, 0)  # first SIGSTOP (TRACEME)
    ptrace(PTRACE_CONT, pid, 0, 0)
    os.waitpid(pid, 0)  # second SIGSTOP: library loaded, about to decode
    # find libdav1d base in child maps
    base = None
    for line in open('/proc/%d/maps' % pid):
        if 'libdav1d' in line and 'r-xp' in line:
            lo, hi = line.split()[0].split('-')
            off = int(line.split()[2], 16)
            base = int(lo, 16) - off
            break
    assert base, 'libdav1d not mapped'
    # plant int3 at entries
    saved = {}
    tracepoints = {}
    for off, (name, cdfarg) in FUNCS.items():
        if name == 'pad': continue
        addr = base + off
        orig = peek(pid, addr)
        poke(pid, addr, (orig & ~0xFF) | 0xCC)
        saved[addr] = orig
        tracepoints[addr] = (name, off)
    log = []
    adapt16_planted = False
    ptrace(PTRACE_CONT, pid, 0, 0)
    while True:
        _, status = os.waitpid(pid, 0)
        if os.WIFEXITED(status):
            break
        if not os.WIFSTOPPED(status):
            continue
        sig = os.WSTOPSIG(status)
        if sig != signal.SIGTRAP:
            ptrace(PTRACE_CONT, pid, 0, sig)
            continue
        regs = getregs(pid)
        rip = regs.rip - 1
        if rip not in tracepoints:
            ptrace(PTRACE_CONT, pid, 0, 0)
            continue
        name, off = tracepoints[rip]
        # harvest args
        cdfp = regs.rsi
        nsym = (regs.rdx & 0xFFFF) if name in ('symbol_adapt', 'adapt16') else (
            1 if name == 'bool_adapt' else (4 if name in ('hi_tok','helper_122b0') else 0))
        cdfvals = []
        if name in ('bool_adapt', 'symbol_adapt', 'adapt16', 'hi_tok', 'helper_122b0'):
            raw = read_mem(pid, cdfp, 2*(nsym+2))
            cdfvals = list(struct.unpack('<%dH' % (nsym+2), raw))
        msacp = regs.rdi
        mraw = read_mem(pid, msacp + 0x10, 16)
        dif, rng, cnt = struct.unpack('<QIi', mraw)
        if not adapt16_planted:
            fp = struct.unpack('<Q', read_mem(pid, msacp + 0x28, 8))[0]
            if fp:
                orig = peek(pid, fp)
                poke(pid, fp, (orig & ~0xFF) | 0xCC)
                saved[fp] = orig
                tracepoints[fp] = ('adapt16', fp - base)
                adapt16_planted = True
        # capture return value: trap at the return address
        retaddr = struct.unpack('<Q', read_mem(pid, regs.rsp, 8))[0]
        ret_orig = peek(pid, retaddr)
        poke(pid, retaddr, (ret_orig & ~0xFF) | 0xCC)
        # single-step through entry: restore, step, re-plant
        poke(pid, rip, saved[rip])
        regs.rip = rip
        setregs(pid, regs)
        ptrace(PTRACE_SINGLESTEP, pid, 0, 0)
        os.waitpid(pid, 0)
        poke(pid, rip, (saved[rip] & ~0xFF) | 0xCC)
        # run to return
        rv = None
        ptrace(PTRACE_CONT, pid, 0, 0)
        while True:
            _, st2 = os.waitpid(pid, 0)
            if os.WIFEXITED(st2):
                rv = -1
                break
            r2 = getregs(pid)
            if r2.rip - 1 == retaddr:
                rv = r2.rax & 0xFFFF
                poke(pid, retaddr, ret_orig)
                r2.rip = retaddr
                setregs(pid, r2)
                break
            # nested msac call hit (entry bp inside callee region): service it minimally
            rip2 = r2.rip - 1
            if rip2 in tracepoints:
                poke(pid, rip2, saved[rip2])
                r2.rip = rip2
                setregs(pid, r2)
                ptrace(PTRACE_SINGLESTEP, pid, 0, 0)
                os.waitpid(pid, 0)
                poke(pid, rip2, (saved[rip2] & ~0xFF) | 0xCC)
            ptrace(PTRACE_CONT, pid, 0, 0)
        if rv == -1:
            break
        log.append((name, nsym, cdfvals, rng & 0xFFFF, rv))
        if len(log) > 9000:
            break
        ptrace(PTRACE_CONT, pid, 0, 0)
    try:
        ptrace(PTRACE_DETACH, pid, 0, 0)
    except OSError:
        pass
    for i, (name, nsym, cdfvals, rng, rv) in enumerate(log):
        print(i, name, 'n=%d' % nsym, 'cdf=%s' % cdfvals, 'rng=%04x' % rng, 's=%d' % rv)

if __name__ == '__main__':
    main()
