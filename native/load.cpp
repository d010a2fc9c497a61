// Batched sin/cos load-vector assembly — native host kernel.
//
// Replaces the hottest data-generation loop of the reference: per-sample
// `L = assemble(inner(f, v) * dx)` with f = (m0 sin(n0 x + n1 y),
// m1 cos(n2 x + n3 y)) (FEONet_Stokes_square/assemble_fenics.py:123-131,
// executed 2000x per dataset). The numpy path in fem/assemble.py evaluates
// the forcing on a (B, nc, nq) grid through ~6 full-array passes (broadcast
// multiplies, sin, cos, einsum, scatter), each materializing a ~200 MB
// temporary at B=1000 — memory-bound at < 0.5 MDoF/s on one core. This
// kernel fuses forcing evaluation, quadrature weighting, and the P2 nodal
// scatter into ONE pass with a 12-double accumulator per cell: no
// temporaries, one sin + one cos + ~30 flops per (sample, cell, point).
//
// float64 throughout — this is the host-precision data path (the .npz / f64
// ground-truth contract); the result is bit-independent of batch order.
//
// Build: native/build.sh  (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>

extern "C" {

// xq:     (nc, nq, 2) physical quadrature points
// wdet:   (nc, nq)    quadrature weight * |det J|
// v2:     (nq, 6)     P2 basis values at the reference points
// dofs:   (nc, 6)     global P2 dof ids per cell
// coeffs: (B, 6)      (m0, m1, n0, n1, n2, n3) per sample
// out:    (B, ng)     zero-initialized; velocity blocks [0, n2) and
//                     [n2, 2 n2) are accumulated, pressure rows stay 0.
// validate_form: 0 -> f = (m0 sin(.), m1 cos(.)) (train form)
//                1 -> f = (m0 + sin(.), m1 + cos(.)) (reference val variant)
int load_sincos(const double* xq, const double* wdet, const double* v2,
                const int32_t* dofs, const double* coeffs,
                int64_t B, int64_t nc, int64_t nq,
                int32_t validate_form, int64_t n2, int64_t ng,
                double* out) {
    for (int64_t b = 0; b < B; ++b) {
        const double m0 = coeffs[b * 6 + 0];
        const double m1 = coeffs[b * 6 + 1];
        const double n0 = coeffs[b * 6 + 2];
        const double n1 = coeffs[b * 6 + 3];
        const double n2c = coeffs[b * 6 + 4];
        const double n3 = coeffs[b * 6 + 5];
        double* row = out + b * ng;
        for (int64_t c = 0; c < nc; ++c) {
            const int32_t* d = dofs + c * 6;
            const double* xc = xq + c * nq * 2;
            const double* wc = wdet + c * nq;
            double acc1[6] = {0, 0, 0, 0, 0, 0};
            double acc2[6] = {0, 0, 0, 0, 0, 0};
            for (int64_t q = 0; q < nq; ++q) {
                const double x = xc[q * 2 + 0];
                const double y = xc[q * 2 + 1];
                const double s = std::sin(n0 * x + n1 * y);
                const double co = std::cos(n2c * x + n3 * y);
                const double f1 = validate_form ? (m0 + s) : (m0 * s);
                const double f2 = validate_form ? (m1 + co) : (m1 * co);
                const double wf1 = wc[q] * f1;
                const double wf2 = wc[q] * f2;
                const double* v = v2 + q * 6;
                for (int i = 0; i < 6; ++i) {
                    acc1[i] += v[i] * wf1;
                    acc2[i] += v[i] * wf2;
                }
            }
            for (int i = 0; i < 6; ++i) {
                row[d[i]] += acc1[i];
                row[n2 + d[i]] += acc2[i];
            }
        }
    }
    return 0;
}

}  // extern "C"
