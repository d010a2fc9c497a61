// SPAI (sparse-approximate-inverse) fixed-point iteration — native core.
//
// The reference's only native compute lives in external C++ (DOLFIN, mshr,
// MUMPS); this is the first-party replacement for the hottest HOST-side
// kernel of this framework: the SPAI preconditioner iteration
// (reference algorithm: FEONet_Stokes_square/train_FEONet.py:104-143).
//
//     M_0 = alpha_0 A,  repeat m times:
//         G = I - A M;  AG = A G
//         alpha = sum(G .* AG) / sum(AG .* AG)
//         M += alpha * G
//
// A is CSR (FEM stencil, ~30 nnz/row), M/G/AG dense row-major. One fused
// pass computes G and streams it; a second computes AG and both reductions —
// ~3 n^2 memory touches per iteration vs numpy's ~8 (each scipy/numpy op is
// a separate full-matrix pass), which is the whole game for a bandwidth-
// bound iteration. Exposed via ctypes (linalg/spai.py); float64 throughout
// to preserve the parity pins (cond 1.4890 / entrywise 1e-11 vs the
// committed FEniCS artifacts).
//
// Build: native/build.sh  (g++ -O3 -march=native -shared -fPIC)

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// rows: n; A in CSR (indptr[n+1], indices[nnz], data[nnz]); M: n*n row-major.
// Returns 0 on success.
int spai_iterate(const int64_t* indptr, const int32_t* indices,
                 const double* data, int64_t n, double* M, int64_t iters) {
    std::vector<double> G(static_cast<std::size_t>(n) * n);
    std::vector<double> AG(static_cast<std::size_t>(n) * n);

    for (int64_t it = 0; it < iters; ++it) {
        // G = I - A @ M   (row i of G = e_i - sum_k A[i,k] * M[k, :])
        for (int64_t i = 0; i < n; ++i) {
            double* gi = &G[i * n];
            for (int64_t j = 0; j < n; ++j) gi[j] = 0.0;
            gi[i] = 1.0;
            for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
                const double a = -data[p];
                const double* mk = &M[static_cast<int64_t>(indices[p]) * n];
                for (int64_t j = 0; j < n; ++j) gi[j] += a * mk[j];
            }
        }
        // AG = A @ G, plus both reductions in the same pass
        double num = 0.0, den = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            double* agi = &AG[i * n];
            for (int64_t j = 0; j < n; ++j) agi[j] = 0.0;
            for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
                const double a = data[p];
                const double* gk = &G[static_cast<int64_t>(indices[p]) * n];
                for (int64_t j = 0; j < n; ++j) agi[j] += a * gk[j];
            }
            const double* gi = &G[i * n];
            for (int64_t j = 0; j < n; ++j) {
                num += gi[j] * agi[j];
                den += agi[j] * agi[j];
            }
        }
        if (den == 0.0) return 1;
        const double alpha = num / den;
        for (int64_t i = 0; i < n * n; ++i) M[i] += alpha * G[i];
    }
    return 0;
}

}  // extern "C"
