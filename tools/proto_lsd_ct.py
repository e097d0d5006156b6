"""Numpy prototype of the factorized (radix-2 DIF) 512-point DFT for the
fused LSD kernel — validates the math before the Pallas implementation.

Pipeline under test (per signal pair, chunks of hop=256, n_fft=512):
  z = c + i*(s*d)  (both real chunk slabs packed as one complex slab)
  3 DIF fold levels (absorbing the zero-padding at level 1)
  8 branches -> 64-point complex DFTs (the only matmul stage)
  frame combine X_f = Z_f + (-1)^k Z_{f+1} in (br, m) scrambled layout
  cyclic frequency-domain Hann 3-tap
  Hermitian unpack |C|^2, |D|^2 at bins 0..256
Checked against a direct rfft-based oracle.
"""

import numpy as np

HOP, NFFT = 256, 512


def fold_branches(z):
    """(NC, 256) complex chunk slab -> list of 8 (NC, 64) complex branches
    b_br with DFT512(zero-padded z)[8m+br] = DFT64(b_br)[m], br = j1+2j2+4j3."""
    t1 = np.arange(256)
    w1 = np.exp(-2j * np.pi * t1 / 512)
    t2 = np.arange(128)
    w2 = np.exp(-2j * np.pi * t2 / 256)
    t3 = np.arange(64)
    w3 = np.exp(-2j * np.pi * t3 / 128)

    def l2(v):
        a, b = v[:, :128], v[:, 128:]
        return a + b, (a - b) * w2

    def l3(u):
        a, b = u[:, :64], u[:, 64:]
        return a + b, (a - b) * w3

    b0, b1 = z, z * w1  # j1 = 0, 1 (zero-padding absorbed: z512[256:]=0)
    out = [None] * 8
    for j1, v in ((0, b0), (1, b1)):
        e, o = l2(v)
        for j2, u in ((0, e), (1, o)):
            ee, oo = l3(u)
            for j3, w in ((0, ee), (1, oo)):
                out[j1 + 2 * j2 + 4 * j3] = w
    return out


def dft64(b):
    m = np.arange(64)
    t = np.arange(64)
    return b @ np.exp(-2j * np.pi * np.outer(t, m) / 64)


def test_fft_identity():
    rng = np.random.RandomState(0)
    nc = 16
    z = rng.randn(nc, 256) + 1j * rng.randn(nc, 256)
    zpad = np.concatenate([z, np.zeros_like(z)], axis=1)
    want = np.fft.fft(zpad, axis=1)  # (NC, 512)
    br = fold_branches(z)
    got = np.empty_like(want)
    for b in range(8):
        got[:, b::8] = dft64(br[b])
    assert np.allclose(got, want, atol=1e-9 * np.abs(want).max())
    print("fft identity OK, max err",
          np.abs(got - want).max() / np.abs(want).max())


def lsd_ct(c, d, scale, eps=1e-8):
    """Full pipeline in scrambled layout; returns per-pair LSD scalar."""
    nc = c.shape[0]
    z = c + 1j * (scale * d)
    br = fold_branches(z)
    Z = [dft64(b) for b in br]  # 8 x (NC, 64), bin k = 8m+br

    # frame combine: frames j=0..NC. X_j = Z[j-1] + (-1)^k Z[j]
    # (-1)^k = (-1)^br. rows: X[0] = s*Z[0] ... X[NC] = Z[NC-1]
    X = []
    for b in range(8):
        s = 1.0 if b % 2 == 0 else -1.0
        zb = Z[b]
        inner = zb[:-1] + s * zb[1:]          # frames 1..NC-1
        x0 = s * zb[:1]                        # frame 0
        xn = zb[-1:]                           # frame NC
        X.append(np.concatenate([x0, inner, xn], axis=0))  # (NC+1, 64)

    # cyclic Hann 3-tap: Y[k] = 0.5X[k] - 0.25(X[k-1] + X[k+1]) mod 512
    Y = []
    for b in range(8):
        if b >= 1:
            xm1 = X[b - 1]
        else:
            xm1 = np.roll(X[7], 1, axis=1)     # k-1 at br=0: br=7, m-1
        if b <= 6:
            xp1 = X[b + 1]
        else:
            xp1 = np.roll(X[0], -1, axis=1)    # k+1 at br=7: br=0, m+1
        Y.append(0.5 * X[b] - 0.25 * (xm1 + xp1))

    # Hermitian unpack via the mirror array M[k] = Y[(512-k) mod 512]:
    # br=0: M = roll(flip(Y[0]), 1); br>=1: M = flip(Y[8-br])
    # |C|^2 = (|Y+conj M|^2)/4, |D|^2 = (|Y-conj M|^2)/4
    # sum over one-sided bins 0..256 = (sum over all k + extra(0) + extra(256))/2
    num = np.zeros((nc + 1,))
    for b in range(8):
        if b == 0:
            M = np.roll(Y[0][:, ::-1], 1, axis=1)
        else:
            M = Y[8 - b][:, ::-1]
        C = 0.5 * (Y[b] + np.conj(M))
        D = 0.5j * (np.conj(M) - Y[b])  # == (Y - conj M)/(2i)
        csq = np.abs(C) ** 2
        dsq = np.abs(D) ** 2
        dmag = np.sqrt(dsq) + eps
        lr = np.log(csq / (dmag * dmag) + eps) ** 2
        num += lr.sum(axis=1)
        if b == 0:
            # bins k=0 (m=0) and k=256 (m=32) counted once, add once more
            num += lr[:, 0] + lr[:, 32]
    frame_ms = num / 2 / (NFFT // 2 + 1)
    return np.sqrt(frame_ms).mean()


def oracle_lsd(c, d, scale, eps=1e-8):
    """Direct oracle matching ops/lsd_fused.py raw-kernel semantics."""
    nc = c.shape[0]
    t = np.concatenate([np.zeros(HOP), c.ravel(), np.zeros(HOP)])
    td = np.concatenate([np.zeros(HOP), scale * d.ravel(), np.zeros(HOP)])
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(NFFT) / NFFT)
    f = nc + 1
    num = np.zeros(f)
    for j in range(f):
        fc = np.fft.rfft(t[j * HOP : j * HOP + NFFT] * win)
        fd = np.fft.rfft(td[j * HOP : j * HOP + NFFT] * win)
        csq = np.abs(fc) ** 2
        dmag = np.abs(fd) + eps
        lr = np.log(csq / (dmag * dmag) + eps) ** 2
        num[j] = lr.mean()
    return np.sqrt(num).mean()


def test_lsd_pipeline():
    rng = np.random.RandomState(1)
    nc = 24
    c = rng.randn(nc, 256)
    d = 0.8 * c.copy() + 0.3 * rng.randn(nc, 256)
    scale = float((c.ravel() @ d.ravel()) / (d.ravel() @ d.ravel() + 1e-8))
    got = lsd_ct(c, d, scale)
    want = oracle_lsd(c, d, scale)
    print("lsd ct:", got, "oracle:", want, "diff:", abs(got - want))
    assert abs(got - want) < 1e-9


if __name__ == "__main__":
    test_fft_identity()
    test_lsd_pipeline()
    print("ALL OK")


# ---- round-5b: separate-real variant (no Hermitian unpack, no flips) ----

def fold_branches_real(x):
    """Real (NC, 256) chunks -> 8 branches; br0 stays real, others complex.
    One-sided trim: stage-2 only needs bins m = 0..31 per branch
    (k = 8m + br <= 255) + the Nyquist bin via the alternating sum."""
    return fold_branches(x.astype(complex))  # prototype: reuse complex folds


def lsd_ct_real(c, d, scale, eps=1e-8):
    nc = c.shape[0]

    def spectra(x):
        br = fold_branches_real(x)
        Z = [dft64(b)[:, :32] for b in br]   # one-sided trim
        nyq = (x * ((-1.0) ** np.arange(256))).sum(axis=1)  # X[256] chunk part
        return Z, nyq

    Zc, qc = spectra(c)
    Zd, qd = spectra(d * scale)

    def frames(Z, q):
        X = []
        for b in range(8):
            s = 1.0 if b % 2 == 0 else -1.0
            zb = Z[b]
            X.append(np.concatenate(
                [s * zb[:1], zb[:-1] + s * zb[1:], zb[-1:]], axis=0))
        xn = np.concatenate([q[:1], q[:-1] + q[1:], q[-1:]], axis=0)
        return X, xn

    def hann(X, xn):
        lane = np.arange(32)
        Y = []
        for b in range(8):
            if b >= 1:
                xm1 = X[b - 1]
            else:
                r = np.roll(X[7], 1, axis=1)
                xm1 = np.where(lane == 0, np.conj(X[1]), r)  # X[-1]=conj X[1]
            if b <= 6:
                xp1 = X[b + 1]
            else:
                r = np.roll(X[0], -1, axis=1)
                xp1 = np.where(lane == 31, xn[:, None], r)   # X[256] real
            Y.append(0.5 * X[b] - 0.25 * (xm1 + xp1))
        ynyq = 0.5 * xn - 0.5 * X[7][:, 31].real             # bin 256
        return Y, ynyq

    Xc, xnc = frames(Zc, qc)
    Xd, xnd = frames(Zd, qd)
    Yc, ycn = hann(Xc, xnc)
    Yd, ydn = hann(Xd, xnd)

    num = np.zeros(nc + 1)
    for b in range(8):
        csq = np.abs(Yc[b]) ** 2
        dmag = np.abs(Yd[b]) + eps
        num += (np.log(csq / dmag**2 + eps) ** 2).sum(axis=1)
    dmag = np.abs(ydn) + eps
    num += np.log(ycn**2 / dmag**2 + eps) ** 2
    return np.sqrt(num / (NFFT // 2 + 1)).mean()


def test_lsd_real():
    rng = np.random.RandomState(2)
    nc = 24
    c = rng.randn(nc, 256)
    d = 0.8 * c.copy() + 0.3 * rng.randn(nc, 256)
    scale = float((c.ravel() @ d.ravel()) / (d.ravel() @ d.ravel() + 1e-8))
    got = lsd_ct_real(c, d, scale)
    want = oracle_lsd(c, d, scale)
    print("lsd ct-real:", got, "oracle:", want, "diff:", abs(got - want))
    assert abs(got - want) < 1e-9
