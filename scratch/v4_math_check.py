"""Numpy validation of the fused3d v4 (overlap-save-D) math:
H one-sided rfft -> W block-diag DFT64 -> page/sublane transpose ->
windowed block DFT16 along D (8-page blocks, hop 8) with packed
radix-2 butterfly -> pointwise frequency MAC -> inverse butterfly +
block-diag IDFT8-pair matmul -> W inverse -> H inverse -> crop.
Checked against scipy-free direct correlation for several shapes."""
import numpy as np

TW = 64


def rfft_mats(n):
    t = np.arange(n)[:, None]
    k = np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / n
    return np.cos(ang), np.sin(ang)


def irfft_mats(n):
    nb = n // 2 + 1
    k = np.arange(nb)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    w = np.full((nb, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    cr = w * np.cos(ang) / n
    ci = -w * np.sin(ang) / n
    ci[0] = 0.0
    if n % 2 == 0:
        ci[-1] = 0.0
    return cr, ci


def dft_mat(n, inverse=False):
    j = np.arange(n)
    sign = 2.0 if inverse else -2.0
    m = np.exp(sign * 1j * np.pi * np.outer(j, j) / n)
    return m / n if inverse else m


def direct_corr(x, w):
    b, cin, d, h, wd = x.shape
    cout, _, kd, kh, kw = w.shape
    od, oh, ow = d - kd + 1, h - kh + 1, wd - kw + 1
    out = np.zeros((b, cout, od, oh, ow))
    for dd in range(kd):
        for hh in range(kh):
            for ww in range(kw):
                out += np.einsum(
                    "bcxyz,oc->boxyz",
                    x[:, :, dd:dd + od, hh:hh + oh, ww:ww + ow],
                    w[:, :, dd, hh, ww])
    return out


def v4_conv(x, w):
    b, cin, d, h, wd = x.shape
    cout, _, kd, kh, kw = w.shape
    assert kd <= 9 and wd <= TW
    nbh = h // 2 + 1
    nbhp = -(-nbh // 8) * 8
    vd = d - kd + 1
    nbd = -(-vd // 8)
    pairs = 4 * (nbd - 1) + 8
    pp = -(-pairs // 8) * 8
    R = 8 * nbd
    vdp = -(-(4 * nbd) // 8) * 8
    vh = h - kh + 1
    od, oh, ow = vd, vh, wd - kw + 1

    # ---- pack signal: xp[b, c, h, p, 64s + w] = x[b, c, 2p + s, h, w]
    xp = np.zeros((b, cin, h, pp, 128))
    for p in range(pp):
        for s in range(2):
            dd = 2 * p + s
            if dd < d:
                xp[:, :, :, p, TW * s:TW * s + wd] = x[:, :, dd]

    # ---- matrices
    frh, fih = rfft_mats(h)           # (h, nbh)
    frm = np.zeros((nbhp, h))
    fim = np.zeros((nbhp, h))
    frm[:nbh] = frh.T
    fim[:nbh] = fih.T
    wf = dft_mat(TW)                  # (64, 64) forward
    wi = dft_mat(TW, inverse=True)
    bw = np.zeros((128, 128), complex)
    bw[:64, :64] = wf
    bw[64:, 64:] = wf
    bu = np.zeros((128, 128), complex)
    bu[:64, :64] = wi
    bu[64:, 64:] = wi
    crh, cih = irfft_mats(h)          # (nbh, h)
    crm = crh.T[:vh]                  # (vh, nbh)
    cim = cih.T[:vh]
    # windowed D fwd: (R, pp), rows f8-major
    wd_ = np.zeros((R, pp), complex)
    for f8 in range(8):
        for j in range(nbd):
            for pprime in range(8):
                wd_[f8 * nbd + j, 4 * j + pprime] = np.exp(
                    -2j * np.pi * pprime * f8 / 8)
    # fwd twiddle (R, 128): sgn(lane) * w16^{f8}
    lane = np.arange(128)
    sgn = np.where(lane < 64, 1.0, -1.0)
    twf = np.zeros((R, 128), complex)
    twv = np.zeros((R, 128), complex)
    for r in range(R):
        f8 = r // nbd
        twf[r] = sgn * np.exp(-2j * np.pi * f8 / 16)
        twv[r] = sgn * np.exp(2j * np.pi * f8 / 16)
    # inverse D: (vdp, R)
    wid = np.zeros((vdp, R), complex)
    for j in range(nbd):
        for q in range(4):
            for f8 in range(8):
                wid[4 * j + q, f8 * nbd + j] = np.exp(
                    2j * np.pi * q * f8 / 8) / 16

    # ---- kernel spectra: conj(DFT_d16(DFT_h(DFT_w(k)))) laid out
    # (8, cin, cout, nbhp, 128) with lanes (hi, w)
    fr_k = frh[:kh].T + 1j * fih[:kh].T          # (nbh, kh) complex
    a = np.einsum("nk,ocdkw->ocdnw", fr_k, w)    # (o,c,kd,nbh,kw)
    bspec = np.einsum("ocdnw,wz->ocdnz", a, wf[:kw])  # (o,c,kd,nbh,64)
    dm = np.zeros((kd, 8, 2), complex)
    for dd in range(kd):
        for f8 in range(8):
            for hi in range(2):
                dm[dd, f8, hi] = np.exp(
                    -2j * np.pi * dd * (f8 + 8 * hi) / 16)
    khat = np.einsum("ocdnz,dfs->fconsz", bspec, dm)  # (8,c,o,nbh,2,64)
    khat = np.conj(khat).reshape(8, cin, cout, nbh, 128)
    kfull = np.zeros((8, cin, cout, nbhp, 128), complex)
    kfull[:, :, :, :nbh] = khat

    out_all = np.zeros((b, cout, vh, vdp, 128))
    for bb in range(b):
        # fwd per channel
        xd = np.zeros((cin, R, nbhp, 128), complex)
        for c in range(cin):
            xc = xp[bb, c]                        # (h, pp, 128)
            hs = np.einsum("nh,hpl->npl", frm + 1j * fim, xc)
            s = np.einsum("npl,lz->npz", hs, bw)  # (nbhp, pp, 128)
            st = np.swapaxes(s, 0, 1)             # (pp, nbhp, 128)
            g = np.einsum("rp,pnl->rnl", wd_, st)  # (R, nbhp, 128)
            rl = np.roll(g, TW, axis=2)
            e = np.where(lane < 64, g, rl)
            o_ = np.where(lane < 64, rl, g)
            xd[c] = e + twf[:, None, :] * o_
        # MAC pointwise; k row index f8 = r // nbd
        y = np.zeros((cout, R, nbhp, 128), complex)
        for r in range(R):
            f8 = r // nbd
            for o in range(cout):
                y[o, r] = (xd[:, r] * kfull[f8, :, o]).sum(axis=0)
        # inverse
        for o in range(cout):
            yo = y[o]
            rl = np.roll(yo, TW, axis=2)
            u = yo + rl
            dv = (yo - rl) * twv[:, None, :]
            pk = np.where(lane < 64, u, dv)       # (R, nbhp, 128)
            z = np.einsum("vr,rnl->vnl", wid, pk)  # (vdp, nbhp, 128)
            e = np.einsum("vnl,lz->vnz", z, bu)   # W inverse
            et = np.swapaxes(e, 0, 1)             # (nbhp, vdp, 128)
            outc = (np.einsum("vn,npl->vpl", crm, et[:nbh].real)
                    + np.einsum("vn,npl->vpl", cim, et[:nbh].imag))
            out_all[bb, o] = outc
    # unpack: out[b, o, 2p+s, vh_, w] = out_all[b, o, vh_, p, 64s+w]
    out = np.zeros((b, cout, od, oh, ow))
    for p in range(vdp):
        for s in range(2):
            dd = 2 * p + s
            if dd < od:
                out[:, :, dd] = out_all[:, :, :oh, p, TW * s:TW * s + ow]
    return out


rng = np.random.default_rng(0)
for (bsz, cin, cout, d, h, wd, kd, kh, kw) in [
    (1, 1, 1, 16, 8, 8, 1, 1, 1),
    (1, 1, 1, 16, 8, 8, 2, 3, 3),
    (2, 2, 3, 24, 16, 12, 8, 5, 4),
    (1, 2, 2, 64, 64, 64, 8, 8, 8),
    (1, 1, 2, 30, 10, 7, 9, 3, 2),
    (1, 3, 1, 17, 12, 64, 7, 6, 9),
    (2, 1, 1, 9, 8, 8, 9, 1, 1),
]:
    x = rng.standard_normal((bsz, cin, d, h, wd))
    w = rng.standard_normal((cout, cin, kd, kh, kw))
    ref = direct_corr(x, w)
    got = v4_conv(x, w)
    err = np.abs(ref - got).max()
    print(f"b{bsz} c{cin}->{cout} {d}x{h}x{wd} k{kd}x{kh}x{kw}: "
          f"max|e| {err:.2e} {'OK' if err < 1e-9 else 'FAIL'}")

for (bsz, cin, cout, d, h, wd, kd, kh, kw) in [
    (1, 1, 1, 16, 9, 8, 2, 3, 3),
    (1, 2, 1, 20, 11, 10, 5, 11, 3),
]:
    x = rng.standard_normal((bsz, cin, d, h, wd))
    w = rng.standard_normal((cout, cin, kd, kh, kw))
    err = np.abs(direct_corr(x, w) - v4_conv(x, w)).max()
    print(f"odd-h b{bsz} {d}x{h}x{wd} k{kd}x{kh}x{kw}: max|e| {err:.2e} "
          f"{'OK' if err < 1e-9 else 'FAIL'}")
