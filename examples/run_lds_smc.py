"""BASELINE config 4: Kalman-like LDS under SMC with collective resampling.

    python examples/run_lds_smc.py --T 20 --smc-particles 8192
"""

import numpy as np

from common import make_parser, run_engine, setup_platform
from lhvi_tpu.config import LDSConfig, from_args


def main():
    args = make_parser(LDSConfig(), __doc__).parse_args()
    cfg = from_args(LDSConfig, args)
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.engines import gabp
    from lhvi_tpu.models.lds import kalman_lds

    g, xs, ys = kalman_lds(T=cfg.T, seed=cfg.seed)
    oracle, _ = gabp.dense_gaussian_marginals(g)
    fg = compile_graph(g)
    res = run_engine(fg, cfg, jax.random.PRNGKey(cfg.seed))

    errs = [abs(res.mean(rv) - oracle[id(rv)][0]) for rv in xs]
    print(
        f"engine={cfg.engine}  wall={res.wall_s:.2f}s  "
        f"smoothed-mean err avg={np.mean(errs):.4f} max={np.max(errs):.4f}"
    )
    if hasattr(res, "log_z"):
        print(f"log-Z estimate = {res.log_z:.3f}")
        used = int(np.asarray(res.diag["n_temps_used"]))
        ess = np.asarray(res.diag["ess"])[:used]
        print(f"min ESS across temperatures = {ess.min():.0f}  "
              f"(temps used: {used}, final step "
              f"{float(res.diag['final_step']):.3f})")
        if cfg.metrics_path:
            from lhvi_tpu.utils.metrics import MetricsLogger

            log = MetricsLogger(cfg.metrics_path)
            # the (self-chosen, under --smc-adaptive) β schedule, plus
            # per-temperature ESS/accept traces — the structured record
            # of what the anneal actually did
            log.log("smc_run",
                    adaptive=cfg.smc_adaptive,
                    n_temps_used=used,
                    betas=np.asarray(res.diag["betas"])[:used].round(5),
                    ess=ess.round(1),
                    accept=np.asarray(res.diag["accept"])[:used].round(3),
                    final_step=round(float(res.diag["final_step"]), 4),
                    log_z=round(float(res.log_z), 4),
                    err_avg=round(float(np.mean(errs)), 5),
                    err_max=round(float(np.max(errs)), 5))
            log.close()


if __name__ == "__main__":
    main()
