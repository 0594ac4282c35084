"""Breakpoint dav1d's intra-pred dispatch (call site 0x10fbe7) and log
(table index, width, height, angle, topleft edge bytes) per call."""
import ctypes, os, sys, struct, signal
sys.path.insert(0, '/tmp/av1p')
from trace_dav1d import (ptrace, peek, poke, getregs, setregs, read_mem, child,
                         PTRACE_CONT, PTRACE_SINGLESTEP, PTRACE_DETACH,
                         user_regs_struct)

CALLSITE = 0x10fbe7

def main():
    streamfile, w, h = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    nmax = int(sys.argv[4]) if len(sys.argv) > 4 else 120
    pid = os.fork()
    if pid == 0:
        child(streamfile, w, h)
        return
    os.waitpid(pid, 0)
    ptrace(PTRACE_CONT, pid, 0, 0)
    os.waitpid(pid, 0)
    base = None
    for line in open('/proc/%d/maps' % pid):
        if 'libdav1d' in line and 'r-xp' in line:
            lo = line.split()[0].split('-')[0]
            off = int(line.split()[2], 16)
            base = int(lo, 16) - off
            break
    addr = base + CALLSITE
    orig = peek(pid, addr)
    poke(pid, addr, (orig & ~0xFF) | 0xCC)
    n = 0
    ptrace(PTRACE_CONT, pid, 0, 0)
    while True:
        _, status = os.waitpid(pid, 0)
        if os.WIFEXITED(status):
            break
        if not os.WIFSTOPPED(status):
            continue
        if os.WSTOPSIG(status) != signal.SIGTRAP:
            ptrace(PTRACE_CONT, pid, 0, os.WSTOPSIG(status))
            continue
        regs = getregs(pid)
        if regs.rip - 1 != addr:
            ptrace(PTRACE_CONT, pid, 0, 0)
            continue
        # args: rdi=dst, rsi=stride, rdx=topleft, ecx=w, r8d=h, r9d=angle
        tl = regs.rdx
        edge = read_mem(pid, tl - 16, 33)
        print('call %d dst=%x stride=%d tlptr=%x w=%d h=%d angle=%d' % (
            n, regs.rdi, ctypes.c_long(regs.rsi).value, tl, regs.rcx & 0xFFFF,
            regs.r8 & 0xFFFF, regs.r9 & 0xFFFFFFFF))
        print('   left(desc) %s | tl=%d | top %s' % (
            list(edge[:16]), edge[16], list(edge[17:])))
        n += 1
        poke(pid, addr, orig)
        regs.rip = addr
        setregs(pid, regs)
        ptrace(PTRACE_SINGLESTEP, pid, 0, 0)
        os.waitpid(pid, 0)
        poke(pid, addr, (orig & ~0xFF) | 0xCC)
        if n >= nmax:
            break
        ptrace(PTRACE_CONT, pid, 0, 0)
    try:
        ptrace(PTRACE_DETACH, pid, 0, 0)
    except OSError:
        pass

if __name__ == '__main__':
    main()
