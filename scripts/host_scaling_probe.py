import multiprocessing as mp, time, sys

def work(n):
    # mimic the encode kernel: numpy + bytes churn
    import numpy as np
    acc = 0
    for _ in range(n):
        a = np.random.rand(4000, 2)
        d = np.diff(a, axis=0)
        acc += int((np.hypot(d[:,0], d[:,1]).sum() * 1000) % 7)
        b = b"".join(int(x*1000).to_bytes(4, "little", signed=True) for x in a[:200, 0])
        acc += b[0]
    return acc

if __name__ == "__main__":
    nproc = int(sys.argv[1])
    per = 60
    t0 = time.time()
    with mp.Pool(nproc) as p:
        p.map(work, [per] * nproc)
    dt = time.time() - t0
    total = per * nproc
    print(f"procs={nproc} rate={total/dt:.1f} units/s per_proc={total/dt/nproc:.2f}")
