import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ["JAX_PLATFORM_NAME"]="cpu"
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.train.metrics import component_errors
from feonet_navier_stokes_tpu.linalg.ns_corrector import steady_weak_residual, _conv_pair, _keep
t0=time.time()
p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=15, ns_branch="stable", bpx_levels=3))
z = np.load("runs/r3/ns450_slim16k.npz", allow_pickle=True)
val_cf = np.asarray(z["val_batch_coeff_f"]); val_t = np.asarray(z["val_truth"], np.float64)
tr_t = np.asarray(z["train_truth"], np.float64)[6000:8000]
u0v = np.load("/tmp/u0v.npy"); u0t = np.load("/tmp/u0t.npy")
lv = p.load64({"coeff_f": val_cf})
keep = _keep(p); A = np.asarray(p.A_truth64)
Q = _conv_pair(p, np.float64)
et = tr_t - u0t
U, S, Vt = np.linalg.svd(et, full_matrices=False)
tv32 = val_t.astype(np.float32)
def err(x): return float(component_errors(np.asarray(x,np.float32), tv32, p.n2)["coeff"])
print("raw", err(u0v), flush=True)
K = 256
V = Vt[:K].T
AV = (A @ V).T  # (K, ng) rows = A v_k
u = u0v.copy()
for it in range(3):
    r = steady_weak_residual(p, u, lv)
    B = u.shape[0]
    upd = np.empty_like(u)
    res_drop = []
    for lo in range(0, B, 25):
        hi = min(B, lo+25); b = hi-lo
        ub = u[lo:hi]
        a_rep = np.repeat(ub, K, axis=0)
        V_til = np.tile(V.T, (b, 1))
        JV = AV[None] + (keep*(Q(a_rep, V_til) + Q(V_til, a_rep))).reshape(b, K, p.ng)
        # least-squares: c = argmin || r - c @ JV ||  (JV rows = J v_k)
        G = JV @ np.swapaxes(JV, 1, 2)          # (b, K, K)
        rhs = (JV @ r[lo:hi, :, None])[..., 0]  # (b, K)
        c = np.linalg.solve(G + 1e-12*np.trace(G,axis1=1,axis2=2)[:,None,None]*np.eye(K), rhs[..., None])[..., 0]
        upd[lo:hi] = c @ V.T
        res_drop.append(float(np.linalg.norm(r[lo:hi] - np.einsum('bk,bkn->bn', c, JV))/np.linalg.norm(r[lo:hi])))
    u = u + upd
    print(f"iter {it+1}", err(u), "resfit", np.mean(res_drop), f"[{time.time()-t0:.0f}s]", flush=True)
