"""BASELINE config 3: hybrid friends-smokers MLN with lifted compression.

    python examples/run_friends_smokers.py --n-people 50 --engine vi
    python examples/run_friends_smokers.py --lifted false  # grounded
"""

from common import make_parser, run_engine, setup_platform
from lhvi_tpu.config import FriendsSmokersConfig, from_args


def main():
    args = make_parser(FriendsSmokersConfig(), __doc__).parse_args()
    cfg = from_args(FriendsSmokersConfig, args)
    jax = setup_platform(args.cpu)

    from lhvi_tpu import compile_graph
    from lhvi_tpu.lift import compile_lifted, lifting_report
    from lhvi_tpu.models.relational import friends_smokers

    rg = friends_smokers(n_people=cfg.n_people, hybrid=cfg.hybrid)
    rg.observe("smokes", ("p0",), 1)
    g, index = rg.ground()
    rep = lifting_report(g)
    print(
        f"ground |V|={rep['n_rvs']} |F|={rep['n_factors']}  ->  "
        f"orbits: rv={rep['n_rv_orbits']} factor={rep['n_factor_orbits']}"
    )

    fg = compile_lifted(g) if cfg.lifted else compile_graph(g)
    res = run_engine(fg, cfg, jax.random.PRNGKey(cfg.seed))
    mode = "lifted" if cfg.lifted else "grounded"
    print(f"engine={cfg.engine} ({mode})  wall={res.wall_s:.2f}s")
    for key in [("smokes", ("p1",)), ("cancer", ("p0",)), ("cancer", ("p1",))]:
        rv = index[key]
        print(f"P({key[0]}{key[1]}) = {res.disc_marginal(rv).round(4)}")
    if cfg.hybrid:
        rv = index[("stress", ("p0",))]
        print(f"E[stress(p0)] = {res.mean(rv):.3f} (smoker)")
        rv = index[("stress", ("p1",))]
        print(f"E[stress(p1)] = {res.mean(rv):.3f} (unknown)")


if __name__ == "__main__":
    main()
