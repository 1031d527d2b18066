"""NumPy oracle transliterations of the reference GLSL, for parity tests.

These are deliberately *independent* scalar/numpy implementations of the
cited reference shaders (src/Shader.h etc.), written directly from the GLSL,
so the framework's fused/rolled implementations can be checked against them.
"""

import math

import numpy as np

PI = math.pi


def offset_oracle(p, dp, resolution, coords, pole_wrap=True):
    """src/Shader.h:81-98, scalar. p, dp are (x, y) pairs; resolution (W, H).

    coords = (phi0, phi1, lam0, lam1) like cornerCoords.
    """
    phi0, phi1, lam0, lam1 = coords
    x = p[0] + dp[0] / resolution[0]
    y = p[1] + dp[1] / resolution[1]
    wrap_x = lam0 < -PI + 1e-4 and lam1 > PI - 1e-3
    if wrap_x:
        x = (x + 1.0) % 1.0
    if phi0 < -PI / 2 + 1e-4 and y < 0 and pole_wrap:
        y = -y
        lam = (x * (lam1 - lam0) + lam0)
        lam = (lam + 2 * PI) % (2 * PI) - PI
        x = (lam - lam0) / (lam1 - lam0)
    if phi1 > PI / 2 - 1e-4 and y > 1 and pole_wrap:
        y = 2 - y
        lam = (x * (lam1 - lam0) + lam0)
        lam = (lam + 2 * PI) % (2 * PI) - PI
        x = (lam - lam0) / (lam1 - lam0)
    if wrap_x:
        x = (x + 1.0) % 1.0
    return x, y


def fetch_nearest(tex, s, t):
    """GL_NEAREST + CLAMP_TO_EDGE. tex is (H, W), row 0 = t=0."""
    H, W = tex.shape
    c = min(max(int(math.floor(s * W)), 0), W - 1)
    r = min(max(int(math.floor(t * H)), 0), H - 1)
    return tex[r, c]


def fetch_bilinear(tex, s, t):
    """GL_LINEAR + CLAMP_TO_EDGE."""
    H, W = tex.shape
    x = s * W - 0.5
    y = t * H - 0.5
    x0 = math.floor(x)
    y0 = math.floor(y)
    fx = x - x0
    fy = y - y0

    def at(r, c):
        return tex[min(max(r, 0), H - 1), min(max(c, 0), W - 1)]

    x0 = int(x0)
    y0 = int(y0)
    top = at(y0, x0) * (1 - fx) + at(y0, x0 + 1) * fx
    bot = at(y0 + 1, x0) * (1 - fx) + at(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def shift_oracle(tex, dx, dy, coords, pole_wrap=True):
    """offset() + nearest fetch at every pixel center."""
    H, W = tex.shape
    out = np.zeros_like(tex)
    for r in range(H):
        for c in range(W):
            s = (c + 0.5) / W
            t = (r + 0.5) / H
            s2, t2 = offset_oracle((s, t), (dx, dy), (W, H), coords, pole_wrap)
            out[r, c] = fetch_nearest(tex, s2, t2)
    return out


def gradient_oracle(tex, coords, circumference=42000.0):
    """src/Shader.h:281-297 per pixel. Returns (dx_field, dy_field)."""
    phi0, phi1, lam0, lam1 = coords
    H, W = tex.shape
    gx = np.zeros_like(tex)
    gy = np.zeros_like(tex)
    for r in range(H):
        for c in range(W):
            s = (c + 0.5) / W
            t = (r + 0.5) / H

            def tap(ox, oy):
                s2, t2 = offset_oracle((s, t), (-ox, -oy), (W, H), coords)
                return fetch_nearest(tex, s2, t2)

            a = tap(1, 1)
            b = tap(0, 1)
            cc = tap(-1, 1)
            d = tap(1, 0)
            f = tap(-1, 0)
            g = tap(1, -1)
            h = tap(0, -1)
            i = tap(-1, -1)
            phi = t * (phi1 - phi0) + phi0
            scale = circumference / (2 * PI)
            pxx = (lam1 - lam0) * math.cos(phi) * scale / W
            pxy = (phi1 - phi0) * scale / H
            gx[r, c] = (-(cc + 2 * f + i) + (a + 2 * d + g)) / (8 * pxx)
            gy[r, c] = ((g + 2 * h + i) - (a + 2 * b + cc)) / (8 * pxy)
    return gx, gy


def laplacian_oracle(tex, coords, circumference=42000.0):
    """src/Shader.h:299-320 per pixel (NEAREST fetches)."""
    phi0, phi1, lam0, lam1 = coords
    H, W = tex.shape
    lx = np.zeros_like(tex)
    ly = np.zeros_like(tex)
    for r in range(H):
        for c in range(W):
            s = (c + 0.5) / W
            t = (r + 0.5) / H
            phi = t * (phi1 - phi0) + phi0
            factor = math.cos(phi)

            def tap(ox, oy):
                s2, t2 = offset_oracle((s, t), (-ox, -oy), (W, H), coords)
                return fetch_nearest(tex, s2, t2)

            a = tap(1 / factor, 1)
            b = tap(0, 1)
            cc = tap(-1 / factor, 1)
            d = tap(1 / factor, 0)
            e = tex[r, c]
            f = tap(-1 / factor, 0)
            g = tap(1 / factor, -1)
            h = tap(0, -1)
            i = tap(-1 / factor, -1)
            scale = circumference / (2 * PI)
            pxy = (phi1 - phi0) * scale / H
            denom = 4 * pxy * pxy
            vx = (a - 2 * b + cc + 2 * d - 4 * e + 2 * f + g - 2 * h + i) / denom
            vy = (a + 2 * b + cc - 2 * d - 4 * e - 2 * f + g + 2 * h + i) / denom
            lx[r, c] = 0.0 if math.isnan(vx) else vx
            ly[r, c] = 0.0 if math.isnan(vy) else vy
    return lx, ly
