import sys; sys.path.insert(0, "/root/repo")
import os, time, json
os.environ["JAX_PLATFORM_NAME"]="cpu"
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np, jax.numpy as jnp
from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.train import Trainer, TrainConfig
from feonet_navier_stokes_tpu.train.metrics import component_errors
from feonet_navier_stokes_tpu.linalg.ns_corrector import steady_weak_residual, _conv_pair, _keep
t0=time.time()
p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=15, ns_branch="stable", bpx_levels=3))
tc = TrainConfig(model="UNetWithHead", loss_mode="supervised", ema_decay=0.999, num_val=8)
tr = Trainer(p, tc)
tr.load_checkpoint("runs/r5/ns450_wsup6k_params.npz")
z = np.load("runs/r3/ns450_slim16k.npz", allow_pickle=True)
def fwd(cf):
    outs=[]
    for lo in range(0, cf.shape[0], 512):
        b={"coeff_f": jnp.asarray(cf[lo:lo+512], jnp.float32)}
        b["load"]=jnp.asarray(p._train_load64(b), jnp.float32)
        outs.append(np.asarray(tr._eval_forward(tr.state, b, tr.ops), np.float64))
    return np.concatenate(outs)
val_cf = np.asarray(z["val_batch_coeff_f"]); val_t = np.asarray(z["val_truth"], np.float64)
tr_cf = np.asarray(z["train_batch_coeff_f"])[6000:8000]; tr_t = np.asarray(z["train_truth"], np.float64)[6000:8000]
u0v = fwd(val_cf); print("val fwd", time.time()-t0, flush=True)
u0t = fwd(tr_cf); print("train fwd", time.time()-t0, flush=True)
lv = p.load64({"coeff_f": val_cf}); lt = p.load64({"coeff_f": tr_cf})
ev = val_t - u0v; et = tr_t - u0t
print("val e rel", np.linalg.norm(ev)/np.linalg.norm(val_t), "train[6000:] e rel", np.linalg.norm(et)/np.linalg.norm(tr_t))
tv32 = val_t.astype(np.float32)
def err(x): return float(component_errors(np.asarray(x,np.float32), tv32, p.n2)["coeff"])
print("raw val", err(u0v))
# (b) frozen-mean-Jacobian Newton
from feonet_navier_stokes_tpu.linalg.newton import _masked_convection_np
keep = _keep(p); A = np.asarray(p.A_truth64)
ubar = tr_t.mean(0)
J = A + keep[:,None]*p._jac_fn(ubar)
Winv = np.linalg.inv(J)
u = u0v.copy()
for k in range(6):
    r = steady_weak_residual(p, u, lv)
    u = u + r @ Winv.T
    print("meanJ iter", k+1, err(u), flush=True)
np.save("/tmp/u0v.npy", u0v); np.save("/tmp/u0t.npy", u0t)
