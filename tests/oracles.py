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


def pixelsize_oracle(t, coords, circumference, W, H):
    """src/Shader.h:71-79 at tex coord t (y). Returns (dx, dy)."""
    phi0, phi1, lam0, lam1 = coords
    phi = t * (phi1 - phi0) + phi0
    scale = circumference / (2 * PI)
    return ((lam1 - lam0) * math.cos(phi) * scale / W,
            (phi1 - phi0) * scale / H)


# ---------------------------------------------------------------------------
# OceanCurrents oracles (src/filter/OceanCurrents.cpp), scalar per pixel
# ---------------------------------------------------------------------------


def _v_to_cartesian(vx, vy, lam, phi):
    """OceanCurrents.cpp vectorShader v_to_cartesian (251-258)."""
    cc = (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam),
          math.sin(phi))
    n = math.hypot(cc[0], cc[1])
    inx, iny = cc[0] / n, cc[1] / n
    y_comp = (math.sin(phi) * (-inx), math.sin(phi) * (-iny), math.cos(phi))
    # normalize(cross((0,0,1), cc)) = (-cc.y, cc.x, 0)/n
    par = (-cc[1] / n, cc[0] / n, 0.0)
    return tuple(vx * par[i] + vy * y_comp[i] for i in range(3))


def _cartesian_to_v(v, lam, phi):
    """OceanCurrents.cpp vectorShader cartesian_to_v (260-268)."""
    cc = (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam),
          math.sin(phi))
    n = math.hypot(cc[0], cc[1])
    inx, iny = cc[0] / n, cc[1] / n
    y_comp = (math.sin(phi) * (-inx), math.sin(phi) * (-iny), math.cos(phi))
    par = (-cc[1] / n, cc[0] / n, 0.0)
    return (sum(v[i] * par[i] for i in range(3)),
            sum(v[i] * y_comp[i] for i in range(3)))


def _rotate(theta, u, p):
    """Shader.h:33-41 axis-angle rotation of p about unit u."""
    c = math.cos(theta)
    s = math.sin(theta)
    o = 1.0 - c
    ux, uy, uz = u
    px, py, pz = p
    return (
        (c + ux * ux * o) * px + (ux * uy * o - uz * s) * py
        + (ux * uz * o + uy * s) * pz,
        (uy * ux * o + uz * s) * px + (c + uy * uy * o) * py
        + (uy * uz * o - ux * s) * pz,
        (uz * ux * o - uy * s) * px + (uz * uy * o + ux * s) * py
        + (c + uz * uz * o) * pz,
    )


def _tex_to_spheric(s, t, coords):
    phi0, phi1, lam0, lam1 = coords
    return s * (lam1 - lam0) + lam0, t * (phi1 - phi0) + phi0


def fetch_bilinear2(u, v, s, t):
    return fetch_bilinear(u, s, t), fetch_bilinear(v, s, t)


def ocean_wind_oracle(t):
    """Zonal wind profile (OceanCurrents.cpp:341-345), incl. the 3.1459
    threshold typo."""
    REF_PI = 3.14159
    phi = 2 * (t - 0.5) * REF_PI
    wx = -10 * math.cos(phi * 3 / 2)
    wy = 10 * math.sin(phi * 3 / 2)
    if abs(phi * 3 / 2) > REF_PI:
        wx = -wx
    if REF_PI * 1 / 3 < abs(phi) < 3.1459 * 2 / 3:
        wy = -wy
    if phi < 0:
        wy = -wy
    return wx, wy


def ocean_advect_oracle(u, v, terrain, coords, circumference=42000.0):
    """Advect pass (OceanCurrents.cpp:235-360) as written: Coriolis * 0.0,
    GL_LINEAR clamp fetch at the backtraced point, NaN guard, wind stress
    and drag.  Returns (u', v')."""
    H, W = u.shape
    REF_PI = 3.14159
    ou = np.zeros_like(u)
    ov = np.zeros_like(v)
    for r in range(H):
        for c in range(W):
            if terrain[r, c] > 0:
                continue
            s = (c + 0.5) / W
            t = (r + 0.5) / H
            vel = (float(u[r, c]), float(v[r, c]))
            dist = math.hypot(*vel) * 24.0
            arclength = 2 * REF_PI / circumference * dist
            lam, phi = _tex_to_spheric(s, t, coords)
            cc = (math.cos(phi) * math.cos(lam),
                  math.cos(phi) * math.sin(lam), math.sin(phi))
            vc = _v_to_cartesian(vel[0], vel[1], lam, phi)
            cr = (cc[1] * vc[2] - cc[2] * vc[1],
                  cc[2] * vc[0] - cc[0] * vc[2],
                  cc[0] * vc[1] - cc[1] * vc[0])
            n = math.sqrt(sum(x * x for x in cr))
            if n == 0.0:
                # normalize(0) -> NaN in GLSL; the NaN guard then zeroes
                newu, newv = 0.0, 0.0
            else:
                axis = tuple(x / n for x in cr)
                q = _rotate(-arclength, axis, cc)
                lam2 = math.atan2(q[1], q[0])
                phi2 = math.asin(max(-1.0, min(1.0, q[2])))
                phi0, phi1, lam0, lam1 = coords
                s2 = (lam2 - lam0) / (lam1 - lam0)
                t2 = (phi2 - phi0) / (phi1 - phi0)
                nu, nv = fetch_bilinear2(u, v, s2, t2)
                tv = _v_to_cartesian(nu, nv, lam2, phi2)
                tv = _rotate(arclength, axis, tv)
                newu, newv = _cartesian_to_v(tv, lam, phi)
                if math.isnan(newu) or math.isnan(newv):
                    newu, newv = 0.0, 0.0
            # Coriolis term multiplied by 0.0 (OceanCurrents.cpp:327): no-op
            wx, wy = ocean_wind_oracle(t)
            sx = 1.0 + 0.0001 * abs(wx - newu) ** 2
            sy = 1.0 + 0.0001 * abs(wy - newv) ** 2
            drag = 1.0 - 0.4 ** (1.0 / 24.0)
            ou[r, c] = newu + wx * (1 - sx ** (-2.0 / 24.0)) - newu * drag
            ov[r, c] = newv + wy * (1 - sy ** (-2.0 / 24.0)) - newv * drag
    return ou, ov


def _get_velocity_oracle(u, v, s, t, ox, oy, coords):
    """Neighbor fetch with the antipodal sign-flip test
    (OceanCurrents.cpp:374-393 / 645-661, without the area factor)."""
    H, W = u.shape
    s2, t2 = offset_oracle((s, t), (ox, oy), (W, H), coords)
    lam, _ = _tex_to_spheric(s, t, coords)
    lam2, _ = _tex_to_spheric(s2, t2, coords)
    vx = fetch_nearest(u, s2, t2)
    vy = fetch_nearest(v, s2, t2)
    if abs(abs(lam - lam2) - 3.14159) < 0.1:
        vx, vy = -vx, -vy
    return vx, vy, s2, t2


def ocean_diffusion_sweep_oracle(u, v, terrain, coords,
                                 circumference=42000.0):
    """One implicit-viscosity Jacobi sweep (OceanCurrents.cpp:625-708) as
    written — including the ``float bC = texture(v,st).r`` scalar-broadcast
    quirk."""
    H, W = u.shape
    ou = np.zeros_like(u)
    ov = np.zeros_like(v)
    for r in range(H):
        for c in range(W):
            s = (c + 0.5) / W
            t = (r + 0.5) / H
            pC = (float(u[r, c]), float(v[r, c]))
            taps = {}
            for name, (ox, oy) in (("N", (0, 1)), ("S", (0, -1)),
                                   ("E", (1, 0)), ("W", (-1, 0))):
                vx, vy, s2, t2 = _get_velocity_oracle(u, v, s, t, ox, oy,
                                                      coords)
                if fetch_nearest(terrain, s2, t2) > 0:
                    vx, vy = pC
                taps[name] = (vx, vy)
            bC = pC[0]
            dx, dy = pixelsize_oracle(t, coords, circumference, W, H)
            wx = (420.0 / dx) ** 2
            wy = (420.0 / dy) ** 2
            beta = 2 * (wx + wy) * (1 + 1 / (2 * (wx + wy)))
            ou[r, c] = ((taps["W"][0] + taps["E"][0]) * wx
                        + (taps["S"][0] + taps["N"][0]) * wy + bC) / beta
            ov[r, c] = ((taps["W"][1] + taps["E"][1]) * wx
                        + (taps["S"][1] + taps["N"][1]) * wy + bC) / beta
    return ou, ov


def ocean_divergence_oracle(u, v, terrain, coords, pressurefactor=100.0,
                            circumference=42000.0):
    """Divergence pass (OceanCurrents.cpp:363-435): neighbor velocities
    times *their* pixel area and pressurefactor, obstacle-zeroed."""
    H, W = u.shape
    out = np.zeros_like(u)
    for r in range(H):
        for c in range(W):
            s = (c + 0.5) / W
            t = (r + 0.5) / H

            def gv(ox, oy):
                vx, vy, s2, t2 = _get_velocity_oracle(u, v, s, t, ox, oy,
                                                      coords)
                d2 = pixelsize_oracle(t2, coords, circumference, W, H)
                solid = fetch_nearest(terrain, s2, t2) > 0
                return (vx * d2[0] * d2[1] * pressurefactor,
                        vy * d2[0] * d2[1] * pressurefactor, solid)

            vN = gv(0, 1)
            vS = gv(0, -1)
            vE = gv(1, 0)
            vW = gv(-1, 0)
            vNy = 0.0 if vN[2] else vN[1]
            vSy = 0.0 if vS[2] else vS[1]
            vEx = 0.0 if vE[2] else vE[0]
            vWx = 0.0 if vW[2] else vW[0]
            dx, dy = pixelsize_oracle(t, coords, circumference, W, H)
            pwx, pwy = dx / 420.0, dy / 420.0
            out[r, c] = 0.5 * ((vEx - vWx) / pwx + (vNy - vSy) / pwy)
    return out


def ocean_jacobi_sweep_oracle(p, divw, terrain, coords,
                              circumference=42000.0):
    """One pressure-Jacobi sweep (OceanCurrents.cpp:437-509)."""
    H, W = p.shape
    out = np.zeros_like(p)
    for r in range(H):
        for c in range(W):
            s = (c + 0.5) / W
            t = (r + 0.5) / H
            pC = float(p[r, c])
            taps = {}
            for name, (ox, oy) in (("N", (0, 1)), ("S", (0, -1)),
                                   ("E", (1, 0)), ("W", (-1, 0))):
                s2, t2 = offset_oracle((s, t), (ox, oy), (W, H), coords)
                val = fetch_nearest(p, s2, t2)
                if fetch_nearest(terrain, s2, t2) > 0:
                    val = pC
                taps[name] = val
            dx, dy = pixelsize_oracle(t, coords, circumference, W, H)
            pw2x = (dx / 420.0) ** 2
            pw2y = (dy / 420.0) ** 2
            beta = 2 * (1 / pw2x + 1 / pw2y)
            fc = ((taps["W"] + taps["E"]) / pw2x
                  + (taps["S"] + taps["N"]) / pw2y - float(divw[r, c])) / beta
            out[r, c] = 0.0 if terrain[r, c] > 0 else fc
    return out


def ocean_project_oracle(u, v, p, terrain, coords, pressurefactor=100.0,
                         circumference=42000.0):
    """Gradient-subtract + coastal free-slip redirect
    (OceanCurrents.cpp:511-622), as written."""
    H, W = u.shape
    ou = np.zeros_like(u)
    ov = np.zeros_like(v)
    offsets = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1),
               (1, -1)]
    for r in range(H):
        for c in range(W):
            if terrain[r, c] > 0:
                continue
            s = (c + 0.5) / W
            t = (r + 0.5) / H
            pC = float(p[r, c])
            taps = {}
            for name, (ox, oy) in (("N", (0, 1)), ("S", (0, -1)),
                                   ("E", (1, 0)), ("W", (-1, 0))):
                s2, t2 = offset_oracle((s, t), (ox, oy), (W, H), coords)
                val = fetch_nearest(p, s2, t2)
                if fetch_nearest(terrain, s2, t2) > 0:
                    val = pC
                taps[name] = val
            dx, dy = pixelsize_oracle(t, coords, circumference, W, H)
            pwx, pwy = dx / 420.0, dy / 420.0
            fx = float(u[r, c]) - 0.5 * (taps["E"] - taps["W"]) / pwx \
                / dx / dy / pressurefactor
            fy = float(v[r, c]) - 0.5 * (taps["N"] - taps["S"]) / pwy \
                / dx / dy / pressurefactor

            o_arr = []
            for (ox, oy) in offsets:
                s2, t2 = offset_oracle((s, t), (ox, oy), (W, H), coords)
                o_arr.append(fetch_nearest(terrain, s2, t2))
            theta = ((math.atan2(fy, fx) / PI + 1) / 2 * 8 + 4) % 8
            lower = int(math.floor(theta) % 8)
            upper = int(math.ceil(theta) % 8)
            is_border = o_arr[lower] > 0 or o_arr[upper] > 0
            nfx, nfy = fx, fy
            difference = 2 * PI
            mag = math.hypot(fx, fy)
            for i, (ox, oy) in enumerate(offsets):
                thetai = ((math.atan2(oy, ox) / PI + 1) / 2 * 8 + 4) % 8
                ang = min((2 * PI) - abs(thetai - theta), abs(thetai - theta))
                if ang < difference and o_arr[int(round(thetai))] <= 0:
                    difference = ang
                    norm = math.hypot(ox, oy)
                    nfx = ox / norm * mag
                    nfy = oy / norm * mag
            if is_border:
                fx, fy = nfx, nfy
            ou[r, c] = fx
            ov[r, c] = fy
    return ou, ov


# ---------------------------------------------------------------------------
# cpufilter erosion-pass oracle (src/filter/cpufilter.cpp:110-199)
# ---------------------------------------------------------------------------


def erosion_pass_oracle(h, flow_map, uplift, coords, factor=1.0,
                        slope_exponent=1.0, circumference=42000.0):
    """The stream-power erosion update, scalar per pixel."""
    H, W = h.shape
    out = np.array(h, copy=True)
    for r in range(H):
        for c in range(W):
            hc = float(h[r, c])
            if hc <= 0:
                continue
            s = (c + 0.5) / W
            t = (r + 0.5) / H
            dx, dy = pixelsize_oracle(t, coords, circumference, W, H)
            maxslope = 0.0
            dist = math.hypot(dx, dy)
            for (ox, oy) in ((1, 1), (0, 1), (-1, 1), (1, 0), (-1, 0),
                             (1, -1), (0, -1), (-1, -1)):
                s2, t2 = offset_oracle((s, t), (ox, oy), (W, H), coords)
                h2 = fetch_nearest(h, s2, t2)
                nd = math.hypot(dx * ox, dy * oy)
                sl = (hc - h2) / nd
                if sl > maxslope:
                    maxslope = sl
                    dist = nd
            SLOPE = math.tan(PI / 2 / 3)
            hdiff = SLOPE * dist - maxslope * dist
            eros = factor * 4.0 * float(flow_map[r, c]) \
                * maxslope ** slope_exponent / 0.1 ** slope_exponent * 0.1
            out[r, c] = hc + min(hdiff, max(0.0, float(uplift[r, c]) - eros))
    return out


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
