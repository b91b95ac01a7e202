"""BASELINE config 2: grid Gaussian MRF with evidence — engine vs GaBP/dense.

    python examples/run_gaussian_grid.py --engine hmc --rows 10 --cols 10
"""

import numpy as np

from common import make_parser, run_engine, setup_platform
from lhvi_tpu.config import GridConfig, from_args


def main():
    args = make_parser(GridConfig(), __doc__).parse_args()
    cfg = from_args(GridConfig, args)
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.engines import gabp
    from lhvi_tpu.models.toy import gaussian_grid

    g, _ = gaussian_grid(cfg.rows, cfg.cols, seed=cfg.seed,
                         evidence_frac=cfg.evidence_frac)
    oracle, latents = gabp.dense_gaussian_marginals(g)

    if cfg.engine == "gabp":
        import time

        t0 = time.perf_counter()
        eng = gabp.GaBP(g).run(cfg.bp_iters)
        wall = time.perf_counter() - t0
        errs = [abs(eng.mean(rv) - oracle[id(rv)][0]) for rv in latents]
        print(f"GaBP  wall={wall:.2f}s  mean-err mean={np.mean(errs):.2e} "
              f"max={np.max(errs):.2e}")
        return

    fg = compile_graph(g)
    res = run_engine(fg, cfg, jax.random.PRNGKey(cfg.seed))
    errs = [abs(res.mean(rv) - oracle[id(rv)][0]) for rv in latents]
    vrel = [
        abs(res.var(rv) - oracle[id(rv)][1]) / oracle[id(rv)][1]
        for rv in latents
    ]
    print(
        f"engine={cfg.engine}  wall={res.wall_s:.2f}s  "
        f"|mean err| avg={np.mean(errs):.4f} max={np.max(errs):.4f}  "
        f"var rel-err avg={np.mean(vrel):.3f}"
    )


if __name__ == "__main__":
    main()
