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
u0v = np.load("/tmp/u0v.npy")[:8]
lv = p.load64({"coeff_f": val_cf})
keep = _keep(p); A = np.asarray(p.A_truth64)
Q = _conv_pair(p, np.float64)
e = val_t - u0v
r0 = steady_weak_residual(p, u0v, lv)
Je = e @ A.T + keep*(Q(u0v, e) + Q(e, u0v))
qee = keep*Q(e, e)
lhs = Je + qee
print("||r0 - (Je+Qee)||/||r0||:", np.linalg.norm(r0-lhs)/np.linalg.norm(r0))
print("||Qee||/||r0||:", np.linalg.norm(qee)/np.linalg.norm(r0))
print("||Je||/||r0||:", np.linalg.norm(Je)/np.linalg.norm(r0))
# per-sample
for i in range(4):
    print(i, np.linalg.norm(r0[i]-lhs[i])/np.linalg.norm(r0[i]), np.linalg.norm(e[i])/np.linalg.norm(val_t[i]))
