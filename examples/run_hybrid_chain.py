"""BASELINE config 1: 3-variable hybrid chain — any engine vs exact.

    python examples/run_hybrid_chain.py --engine nuts
    python examples/run_hybrid_chain.py --engine vi --vi-k 8 --cpu
"""

from common import make_parser, run_engine, setup_platform
from lhvi_tpu.config import ChainConfig, from_args


def main():
    args = make_parser(ChainConfig(), __doc__).parse_args()
    cfg = from_args(ChainConfig, args)
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.models.toy import hybrid_chain
    from lhvi_tpu.utils.oracle import ExactPosterior

    g, (d, x1, x2) = hybrid_chain()
    exact = ExactPosterior(g, cont_grid=161)
    fg = compile_graph(g)
    res = run_engine(fg, cfg, jax.random.PRNGKey(cfg.seed))

    print(f"engine={cfg.engine}  wall={res.wall_s:.2f}s")
    print(f"{'rv':4s} {'E[x] got':>10s} {'E[x] exact':>10s} {'err':>8s}")
    for rv, nm in [(x1, "x1"), (x2, "x2")]:
        m, me = res.mean(rv), exact.mean(rv)
        print(f"{nm:4s} {m:10.4f} {me:10.4f} {abs(m - me):8.4f}")
    if cfg.engine != "mws":
        pd, pde = res.disc_marginal(d), exact.disc_marginal(d)
        print(f"P(d)  got={pd.round(4)}  exact={pde.round(4)}")
    else:
        print(f"MAP: d*={res.map(d)} x1*={res.map(x1):.3f} x2*={res.map(x2):.3f}")


if __name__ == "__main__":
    main()
