"""All-engine comparison on the hybrid chain (reference ``Demo.py``
methodology parity: build model → run every engine → compare marginals and
wall time against the exact answer).

    python examples/demo.py --cpu
"""

import argparse
import time

import numpy as np

from common import setup_platform


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.engines import hmc, nuts, smc, vi
    from lhvi_tpu.engines.epbp import EPBP, EPBPConfig
    from lhvi_tpu.engines.lbp import HybridLBP
    from lhvi_tpu.engines.map_search import HybridMaxWalkSAT
    from lhvi_tpu.models.toy import hybrid_chain
    from lhvi_tpu.utils.oracle import ExactPosterior

    g, (d, x1, x2) = hybrid_chain()
    exact = ExactPosterior(g, cont_grid=161)
    fg = compile_graph(g)
    key = jax.random.PRNGKey(args.seed)

    runs = {
        "nuts": lambda: nuts.sample(fg, key, n_chains=16, n_warmup=300,
                                    n_samples=600),
        "hmc": lambda: hmc.sample(fg, key, n_chains=32, n_warmup=400,
                                  n_samples=1000),
        "vi": lambda: vi.infer(fg, key, vi.VIConfig(K=8, n_iters=1500)),
        "smc": lambda: smc.sample(fg, key, smc.SMCConfig(n_particles=4096,
                                                         n_temps=40)),
        "lbp": lambda: HybridLBP(fg).run(30),
        "epbp": lambda: EPBP(fg, EPBPConfig(128, 40)).run(key),
    }

    print(f"exact:  E[x1]={exact.mean(x1):+.3f}  E[x2]={exact.mean(x2):+.3f}"
          f"  P(d=1)={exact.disc_marginal(d)[1]:.3f}")
    print(f"{'engine':6s} {'E[x1]':>8s} {'E[x2]':>8s} {'P(d=1)':>8s} "
          f"{'max err':>8s} {'wall':>7s}")
    for name, run in runs.items():
        t0 = time.perf_counter()
        res = run()
        wall = time.perf_counter() - t0
        errs = [
            abs(res.mean(x1) - exact.mean(x1)),
            abs(res.mean(x2) - exact.mean(x2)),
            abs(res.disc_marginal(d)[1] - exact.disc_marginal(d)[1]),
        ]
        print(f"{name:6s} {res.mean(x1):+8.3f} {res.mean(x2):+8.3f} "
              f"{res.disc_marginal(d)[1]:8.3f} {max(errs):8.3f} {wall:6.1f}s")

    t0 = time.perf_counter()
    mws = HybridMaxWalkSAT(fg).run(key)
    want = exact.map_state()
    print(f"mws    MAP: d*={mws.map(d)} (exact {want[d]})  "
          f"x1*={mws.map(x1):+.2f} (exact {want[x1]:+.2f})  "
          f"wall {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
