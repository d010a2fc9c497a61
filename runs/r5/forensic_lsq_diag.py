import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORM_NAME"]="cpu"
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.linalg.ns_corrector import steady_weak_residual, _conv_pair, _keep
p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=15, ns_branch="stable", bpx_levels=3))
z = np.load("runs/r3/ns450_slim16k.npz", allow_pickle=True)
val_cf = np.asarray(z["val_batch_coeff_f"])[:8]; val_t = np.asarray(z["val_truth"], np.float64)[:8]
tr_t = np.asarray(z["train_truth"], np.float64)[6000:8000]
u0v = np.load("/tmp/u0v.npy")[:8]; u0t = np.load("/tmp/u0t.npy")
lv = p.load64({"coeff_f": val_cf})
keep = _keep(p); A = np.asarray(p.A_truth64)
Q = _conv_pair(p, np.float64)
e = val_t - u0v
et = tr_t - u0t
U,S,Vt = np.linalg.svd(et, full_matrices=False)
K = 256; V = Vt[:K].T
r0 = steady_weak_residual(p, u0v, lv)
for i in range(3):
    u_i = u0v[i]
    JV = (A @ V).T + keep*(Q(np.tile(u_i,(K,1)), V.T) + Q(V.T, np.tile(u_i,(K,1))))
    # LSQ c: min ||r0_i - c@JV||
    c, res, rank, sv = np.linalg.lstsq(JV.T, r0[i], rcond=None)
    step = c @ V.T   # wait: c@JV approximates r0; the error update is V c
    resfit = np.linalg.norm(r0[i] - c@JV)/np.linalg.norm(r0[i])
    e_cap = np.linalg.norm(e[i] - V@(V.T@e[i]))/np.linalg.norm(e[i])
    step_err = np.linalg.norm(V@c - e[i])/np.linalg.norm(e[i])
    print(i, "resfit", resfit, "e outside V", e_cap, "||Vc - e||/||e||", step_err,
          "cond(JV)", sv[0]/sv[-1])
