"""gaussianprocesses_jl_tpu — a TPU-native Gaussian process inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
GaussianProcesses.jl (the STOR-i Julia package): exact GP regression (GPE),
latent-variable GPs with non-Gaussian likelihoods (GPA) sampled by HMC and
elliptical slice sampling, variational inference, sparse inducing-point
approximations (SoR/DTC/FITC/FSA), cross-validation, and composite
kernel/mean algebra — built on pure-functional pytree modules, `jax.grad`
for every gradient the reference derives by hand, and `shard_map` + mesh
collectives for multi-chip scaling.

Typical usage:

    import gaussianprocesses_jl_tpu as gp
    k = gp.SE(0.0, 0.0) * gp.Periodic(0.0, 0.0, 1.0) + gp.RQ(0.0, 0.0, 0.0)
    m = gp.GPE(x, y, gp.MeanZero(), k, lognoise=-1.0)
    m.optimize()
    mu, var = m.predict_y(xtest)
"""

from .ops.kernels import (
    SE,
    RQ,
    Lin,
    Matern,
    SEIso,
    SEArd,
    Mat12Iso,
    Mat32Iso,
    Mat52Iso,
    Mat12Ard,
    Mat32Ard,
    Mat52Ard,
    RQIso,
    RQArd,
    Periodic,
    LinIso,
    LinArd,
    Poly,
    Noise,
    Const,
    SumKernel,
    ProdKernel,
    Masked,
    FixedKernel,
    Kernel,
    fix,
    free,
)
from .ops.means import (
    Mean,
    MeanZero,
    MeanConst,
    MeanLin,
    MeanPoly,
    MeanPeriodic,
    SumMean,
    ProdMean,
)
from .ops.likelihoods import (
    Likelihood,
    GaussLik,
    BernLik,
    PoisLik,
    StuTLik,
    ExpLik,
    BinLik,
)
from .models.covariance import FullCovariance
from .models.gpe import GPE, GP, GPEParams, noise_variance
from .models.gpa import GPA, GPAParams
from .models.elastic import ElasticGPE
from .models.sparse import (
    SoR,
    DTC,
    FITC,
    FSA,
    SubsetOfRegsStrategy,
    DeterminTrainCondStrat,
    FullyIndepStrat,
    FullScaleApproxStrat,
)
from .inference.mcmc import mcmc, ess
from .inference.split import split_hmc, SplitHMCResult
from .inference.optimize import optimize
from .inference.vi import vi, elbo, Approx, vi_predict_f, vi_predict_y
from .inference.crossvalidation import (
    predict_LOO,
    logp_LOO,
    dlogp_LOO,
    predict_CVfold,
    logp_CVfold,
    dlogp_CVfold,
)
from .inference.diagnostics import effective_sample_size, split_rhat
from .utils import priors
from .utils.checkpoint import save_checkpoint, load_checkpoint
from .utils.params import Param
from .utils.modules import Module
from .plot import plot_gp, plot_gp_2d
from .sklearn import GPRegressor
from .parallel.dense import DistributedFullCovariance
from .parallel.gram import ring_gram
from .parallel.mesh import make_mesh
from .parallel.vi import sharded_vi, sharded_elbo, sharded_vi_train

__version__ = "0.1.0"
