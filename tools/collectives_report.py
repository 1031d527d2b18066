"""HLO-derived collectives-per-step table: GSPMD vs amortized paths.

The environment cannot measure ICI scaling (one real chip; virtual CPU
devices share 2 cores), so the committable scaling evidence is the
COMMUNICATION STRUCTURE of the compiled programs: how many collectives a
coupled step issues and how many bytes they move, and whether they sit
inside convergence loops (executed once per round) or at top level
(executed once per step).  Extracted from the compiled HLO of
coupled_step on the 8-virtual-device CPU mesh.

    python tools/collectives_report.py [> SCALING_r05.json]
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

COLLECTIVES = ("collective-permute", "all-gather", "all-to-all",
               "all-reduce", "reduce-scatter")
_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2,
                "f16": 2, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def _shape_bytes(tok):
    m = re.match(r"\(?([a-z0-9]+)\[([0-9,]*)\]", tok)
    if not m:
        return 0
    d = _DTYPE_BYTES.get(m.group(1), 4)
    dims = m.group(2)
    n = 1
    for x in dims.split(",") if dims else []:
        n *= int(x)
    return d * n


def analyze(hlo: str):
    """Count collective instructions, split top-level vs inside while
    bodies (transitively), with per-instruction payload bytes."""
    # computation blocks: '%name (..) -> .. {' or 'ENTRY %name ..'
    comp_of_line = {}
    cur = None
    lines = hlo.splitlines()
    for idx, ln in enumerate(lines):
        # header: '%name (params) -> type {' — params may nest parens
        # (tuple types), so match only the leading name
        m = re.match(r"\s*(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(", ln)
        if m and ln.rstrip().endswith("{") and "->" in ln:
            cur = m.group(1)
        comp_of_line[idx] = cur

    # which computations are while bodies/conds (transitively reachable
    # only through while ops)?  Simpler: mark computations referenced by
    # while(...) body=/condition= and all computations they call.
    calls = {}
    loop_roots = set()
    for idx, ln in enumerate(lines):
        c = comp_of_line[idx]
        if c is None:
            continue
        for ref in re.findall(r"(?:to_apply|body|condition)=%?([\w\.\-]+)",
                              ln):
            calls.setdefault(c, set()).add(ref)
            if re.search(r"\bwhile\(", ln):
                loop_roots.add(ref)
        for ref in re.findall(r"(?:calls|branch_computations)=\{([^}]*)\}",
                              ln):
            for r2 in re.findall(r"%?([\w\.\-]+)", ref):
                calls.setdefault(c, set()).add(r2)

    in_loop = set()
    frontier = list(loop_roots)
    while frontier:
        c = frontier.pop()
        if c in in_loop:
            continue
        in_loop.add(c)
        frontier.extend(calls.get(c, ()))

    out = {"top_level": {}, "in_loop": {}}
    bytes_out = {"top_level": 0, "in_loop": 0}
    for idx, ln in enumerate(lines):
        for op in COLLECTIVES:
            if re.search(rf"=\s*\(?\S*\s*{op}\(", ln) or f" {op}(" in ln:
                where = ("in_loop" if comp_of_line[idx] in in_loop
                         else "top_level")
                out[where][op] = out[where].get(op, 0) + 1
                m = re.search(r"=\s*(\(?[a-z0-9]+\[[0-9,]*\][^ ]*)", ln)
                if m:
                    tok = m.group(1)
                    if tok.startswith("("):  # tuple result: sum elements
                        bytes_out[where] += sum(
                            _shape_bytes(t) for t in
                            re.findall(r"[a-z0-9]+\[[0-9,]*\]", tok))
                    else:
                        bytes_out[where] += _shape_bytes(tok)
                break
    return out, bytes_out


def main():
    from demiurge_tpu import Grid
    from demiurge_tpu.dist import field_sharding, make_mesh
    from demiurge_tpu.model import CoupledConfig, coupled_step, init_coupled
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.ops.ocean import OceanConfig

    g = Grid(512, 256)
    mesh = make_mesh(8, shape=(2, 4))
    cfg = CoupledConfig(climate_substeps=10,
                        ocean=OceanConfig(jacobi_iters=200,
                                          diffusion_iters=50))
    h = fbm(g, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0, seed=7))
    st = init_coupled(h, g)
    s = field_sharding(mesh)
    sts = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if getattr(x, "ndim", 0) == 2 else x,
        st)

    report = {
        "note": ("Communication structure of one coupled step, from "
                 "compiled HLO on the 8-virtual-device CPU mesh (2x4). "
                 "'in_loop' collectives execute once per solver round "
                 "(pressure: iters/k rounds; viscosity: iters/k; GSPMD: "
                 "once per sweep/tap); 'top_level' once per step. The "
                 "amortized path moves its deep-solver traffic out of "
                 "loops entirely for flow/climate/advect and cuts "
                 "pressure/viscosity rounds k-fold, with the center "
                 "sweeps data-independent of the in-round ppermutes "
                 "(dist.halo._overlapped_ksweeps)."),
        "grid": list(g.shape), "mesh": [2, 4],
        "config": {"jacobi_iters": 200, "diffusion_iters": 50,
                   "climate_substeps": 10, "halo_k": 8},
    }
    for name, kwargs in (("gspmd", {}), ("amortized", {"mesh": mesh})):
        fn = jax.jit(lambda st_: coupled_step(st_, g, cfg, **kwargs))
        hlo = fn.lower(sts).compile().as_text()
        counts, nbytes = analyze(hlo)
        report[name] = {
            "collective_sites": counts,
            "payload_bytes_per_execution": nbytes,
            "total_sites": sum(v for d in counts.values()
                               for v in d.values()),
        }
    json.dump(report, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
