"""kissabc_tpu — a TPU-native likelihood-free (ABC) inference engine.

A from-scratch JAX/XLA rebuild of the capabilities of KissABC.jl
(https://github.com/francescoalemanno/KissABC.jl): the user supplies a
prior (``Factored`` or any distribution here) and a cost function wrapping
a stochastic simulator; the engine returns posterior samples as
``Particles``.

Samplers:
- ``sample(model, AIS(N), Ns, ...)`` — affine-invariant ensemble MCMC
  (red/black parallelized stretch/DE/walk mixture) over ABC densities
  (``ApproxPosterior``, ``ApproxKernelizedPosterior``) or classical
  targets (``CommonLogDensity``).
- ``smc(prior, cost, ...)`` — adaptive-epsilon SMC-ABC (the flagship).
- ``ABCDE(prior, cost, eps, ...)`` — ABC differential evolution.
- ``pfilter(prior, cost, N, ...)`` — quantile particle filter.
- ``abc_rejection(prior, cost, n, ...)`` — textbook rejection ABC
  (streaming top-k budget mode or fixed-threshold mode; beyond-reference).

Everything compiles to single XLA programs (``lax.while_loop``/``scan``
carries, struct-of-arrays particle pytrees) and shards the walker/chain
axes over a ``jax.sharding.Mesh`` (see ``kissabc_tpu.parallel``).

Like the reference re-exports Distributions.jl and
MonteCarloMeasurements.jl (KissABC.jl:13-14), this package re-exports its
distributions and the ``Particles`` result type at the top level.
"""

from .distributions import (  # noqa: F401
    Affine, Arcsine, Bernoulli, Beta, BetaBinomial, BetaPrime, Binomial,
    Biweight,
    Categorical, Cauchy, Chi,
    Chisq, Cosine, Dirac, Dirichlet, DiscreteNonParametric, DiscreteUniform,
    Distribution, Epanechnikov,
    Erlang, Exponential,
    Factored, FDist, Frechet, Gamma, GeneralizedExtremeValue,
    GeneralizedPareto, Geometric, Gumbel,
    Hypergeometric, IID, InverseGamma, InverseGaussian, InverseWishart,
    JohnsonSU,
    Kumaraswamy, Laplace, Levy, Lindley, LKJ, LKJCholesky,
    Logistic, LogitNormal, LogNormal, LogUniform, Mixture, MixtureModel,
    MultivariateNormal, Multinomial, MvLogNormal, MvNormal, MvTDist,
    NegativeBinomial, NoncentralChisq, Normal, NormalCanon, Pareto,
    PGeneralizedGaussian, Poisson, PoissonBinomial, Product, Rayleigh, Rician,
    Wishart,
    Semicircle, Skellam, StudentT, SymTriangularDist, TDist, TriangularDist,
    Triweight, Truncated,
    TruncatedDiscrete, TruncatedNormal, Uniform, VonMises, Weibull,
)
from .particles import (  # noqa: F401
    Particles, chainsstack, hpdi, particles_from_tree, pmap_apply,
    pmean, pstd, pmedian, pquantile, sigmapoints, pm, plus_minus,
)
from .statistics import (  # noqa: F401
    mean, var, std, median, mode, skewness, kurtosis, entropy,
    minimum, maximum, insupport, cov, params,
    cdf, ccdf, logcdf, logccdf, pdf, logpdf, quantile, cquantile,
    fit, fit_mle,
    support, truncated, product_distribution, cor, loglikelihood, rand,
)
from .core.density import (  # noqa: F401
    ApproxKernelizedPosterior, ApproxPosterior, CommonLogDensity,
)
from .core.ais import (  # noqa: F401
    AIS, MCMCDistributed, MCMCThreads, make_run, make_sweep,
    make_sweep_halves, sample, sample_raw,
)
from .core.smc import smc, smc_stepped  # noqa: F401
from .core.tsmc import tsmc  # noqa: F401
from .core.abcde import ABCDE  # noqa: F401
from .core.pfilter import pfilter  # noqa: F401
from .core.rejection import abc_rejection  # noqa: F401
from .utils import checkpoint  # noqa: F401
from .utils.logging import IterLog, trace  # noqa: F401
from .utils.diagnostics import ess, rhat  # noqa: F401
from .utils.host_sim import host_cost  # noqa: F401
from .ops.pallas_kernels import (  # noqa: F401
    make_fused_abcde_generation, make_fused_ais_sweep,
    make_fused_smc_sweep, make_fused_tempered_sweep,
    make_streaming_moment_cost, make_streaming_scan_cost,
    shard_batched_cost,
)

__version__ = "0.5.0"
from .particles import pcov, pcor  # noqa: F401
