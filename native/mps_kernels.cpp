// Native CPU reference kernels for the MPS engine.
//
// The reference framework's performance-critical native component is the
// Qiskit Aer C++ MPS simulator (SURVEY.md: mps_operations.py:251-257).  This
// library is the TPU framework's native counterpart: a dependency-free C++
// implementation of the two hot MPS kernels —
//
//   * complex SVD via one-sided Jacobi (no LAPACK/BLAS dependency),
//   * the Vidal pair update: lam-Gamma contraction + gate application +
//     SVD + discarded-weight truncation + re-split,
//
// exposed through a C ABI and bound with ctypes
// (aqc_research_tpu/io/native.py).  It serves as (a) an independent parity
// oracle for the JAX/XLA MPS path (tests/test_native.py) and (b) a fast
// host-side fallback where no accelerator is present.
//
// Complex numbers are passed as interleaved double pairs (re, im) in
// row-major order.

#include <cmath>
#include <complex>
#include <cstring>
#include <vector>

using cplx = std::complex<double>;

namespace {

// One-sided Jacobi SVD: A (m x n, m >= n) -> A = U S V^H.
// On return: u (m x n), s (n), vh (n x n).  Returns sweep count or -1.
int jacobi_svd(int m, int n, const cplx* a_in, cplx* u, double* s, cplx* vh) {
    if (m < n || m <= 0 || n <= 0) return -1;
    std::vector<cplx> a(a_in, a_in + (size_t)m * n);        // working copy (m x n)
    std::vector<cplx> v((size_t)n * n, cplx(0.0, 0.0));     // accumulated V
    for (int i = 0; i < n; ++i) v[(size_t)i * n + i] = 1.0;

    const double eps = 1e-15;
    const int max_sweeps = 60;
    int sweep = 0;
    for (; sweep < max_sweeps; ++sweep) {
        double off = 0.0;
        for (int p = 0; p < n - 1; ++p) {
            for (int q = p + 1; q < n; ++q) {
                // Gram entries of columns p, q.
                double app = 0.0, aqq = 0.0;
                cplx apq(0.0, 0.0);
                for (int i = 0; i < m; ++i) {
                    const cplx& xp = a[(size_t)i * n + p];
                    const cplx& xq = a[(size_t)i * n + q];
                    app += std::norm(xp);
                    aqq += std::norm(xq);
                    apq += std::conj(xp) * xq;
                }
                const double apq_abs = std::abs(apq);
                if (apq_abs <= eps * std::sqrt(app * aqq) || apq_abs == 0.0) continue;
                off += apq_abs;

                // Jacobi rotation diagonalizing [[app, apq], [conj(apq), aqq]].
                const double tau = (aqq - app) / (2.0 * apq_abs);
                const double t =
                    (tau >= 0.0 ? 1.0 : -1.0) /
                    (std::abs(tau) + std::sqrt(1.0 + tau * tau));
                const double c = 1.0 / std::sqrt(1.0 + t * t);
                const cplx phase = apq / apq_abs;
                const cplx sr = t * c * phase;  // complex sine

                for (int i = 0; i < m; ++i) {
                    const cplx xp = a[(size_t)i * n + p];
                    const cplx xq = a[(size_t)i * n + q];
                    a[(size_t)i * n + p] = c * xp - std::conj(sr) * xq;
                    a[(size_t)i * n + q] = sr * xp + c * xq;
                }
                for (int i = 0; i < n; ++i) {
                    const cplx vp = v[(size_t)i * n + p];
                    const cplx vq = v[(size_t)i * n + q];
                    v[(size_t)i * n + p] = c * vp - std::conj(sr) * vq;
                    v[(size_t)i * n + q] = sr * vp + c * vq;
                }
            }
        }
        if (off <= 1e-30) break;
    }

    // Column norms -> singular values; sort descending.
    std::vector<double> sv(n);
    std::vector<int> order(n);
    for (int j = 0; j < n; ++j) {
        double nrm = 0.0;
        for (int i = 0; i < m; ++i) nrm += std::norm(a[(size_t)i * n + j]);
        sv[j] = std::sqrt(nrm);
        order[j] = j;
    }
    for (int i = 0; i < n - 1; ++i)  // simple selection sort (n is small)
        for (int j = i + 1; j < n; ++j)
            if (sv[order[j]] > sv[order[i]]) std::swap(order[i], order[j]);

    for (int jj = 0; jj < n; ++jj) {
        const int j = order[jj];
        s[jj] = sv[j];
        const double inv = sv[j] > 1e-300 ? 1.0 / sv[j] : 0.0;
        for (int i = 0; i < m; ++i)
            u[(size_t)i * n + jj] = a[(size_t)i * n + j] * inv;
        for (int i = 0; i < n; ++i)  // vh row jj = conj(V column j)
            vh[(size_t)jj * n + i] = std::conj(v[(size_t)i * n + j]);
    }
    return sweep;
}

}  // namespace

extern "C" {

// SVD entry point: a, u: m x n; s: n; vh: n x n (complex interleaved).
int aqc_svd_c128(int m, int n, const double* a, double* u, double* s, double* vh) {
    return jacobi_svd(m, n, reinterpret_cast<const cplx*>(a),
                      reinterpret_cast<cplx*>(u), s,
                      reinterpret_cast<cplx*>(vh));
}

// Vidal pair update on adjacent sites (see ops/mps.py::apply_2q_mps for the
// exact semantics this mirrors):
//   theta = lam_l . g1 . lam_c . g2 . lam_r;  theta' = gate theta;
//   SVD; discard tail with norm <= trunc_thr * ||S||, cap rank at chi,
//   rescale kept values to preserve the norm; re-split with safe inverses.
// Shapes: lam_* (chi), g1/g2 (2, chi, chi), gate4 (4, 4) in (site, site+1)
// index order; outputs same shapes as inputs.
int aqc_mps_pair_update(int chi, double trunc_thr,
                        const double* lam_l_, const double* lam_c_,
                        const double* lam_r_, const double* g1_,
                        const double* g2_, const double* gate4_,
                        double* out_g1_, double* out_g2_, double* out_lam_) {
    const double* lam_l = lam_l_;
    const double* lam_c = lam_c_;
    const double* lam_r = lam_r_;
    const cplx* g1 = reinterpret_cast<const cplx*>(g1_);
    const cplx* g2 = reinterpret_cast<const cplx*>(g2_);
    const cplx* gate = reinterpret_cast<const cplx*>(gate4_);
    cplx* out_g1 = reinterpret_cast<cplx*>(out_g1_);
    cplx* out_g2 = reinterpret_cast<cplx*>(out_g2_);

    const int C = chi;
    auto G1 = [&](int sft, int a, int b) -> cplx { return g1[((size_t)sft * C + a) * C + b]; };
    auto G2 = [&](int sft, int a, int b) -> cplx { return g2[((size_t)sft * C + a) * C + b]; };

    // theta[s, t, a, c] = lam_l[a] G1[s,a,b] lam_c[b] G2[t,b,c] lam_r[c]
    std::vector<cplx> theta((size_t)4 * C * C, cplx(0, 0));
    {
        // tmp1[s,a,b] = lam_l[a] G1[s,a,b] lam_c[b]
        std::vector<cplx> tmp1((size_t)2 * C * C);
        for (int sft = 0; sft < 2; ++sft)
            for (int a = 0; a < C; ++a)
                for (int b = 0; b < C; ++b)
                    tmp1[((size_t)sft * C + a) * C + b] =
                        lam_l[a] * G1(sft, a, b) * lam_c[b];
        for (int sft = 0; sft < 2; ++sft)
            for (int t = 0; t < 2; ++t)
                for (int a = 0; a < C; ++a)
                    for (int c = 0; c < C; ++c) {
                        cplx acc(0, 0);
                        for (int b = 0; b < C; ++b)
                            acc += tmp1[((size_t)sft * C + a) * C + b] * G2(t, b, c);
                        theta[(((size_t)sft * 2 + t) * C + a) * C + c] =
                            acc * lam_r[c];
                    }
    }

    // Apply the gate on the physical pair: theta'[u,v] = gate[uv, st] theta[s,t].
    std::vector<cplx> theta2((size_t)4 * C * C, cplx(0, 0));
    for (int uv = 0; uv < 4; ++uv)
        for (int st = 0; st < 4; ++st) {
            const cplx gse = gate[(size_t)uv * 4 + st];
            if (gse == cplx(0, 0)) continue;
            const cplx* src = &theta[(size_t)st * C * C];
            cplx* dst = &theta2[(size_t)uv * C * C];
            for (int i = 0; i < C * C; ++i) dst[i] += gse * src[i];
        }

    // M[(s a), (t c)] — reorder (s,t,a,c) -> (s,a),(t,c).
    const int M = 2 * C;
    std::vector<cplx> mat((size_t)M * M);
    for (int sft = 0; sft < 2; ++sft)
        for (int t = 0; t < 2; ++t)
            for (int a = 0; a < C; ++a)
                for (int c = 0; c < C; ++c)
                    mat[((size_t)(sft * C + a)) * M + (t * C + c)] =
                        theta2[(((size_t)sft * 2 + t) * C + a) * C + c];

    std::vector<cplx> u((size_t)M * M);
    std::vector<double> s(M);
    std::vector<cplx> vh((size_t)M * M);
    if (jacobi_svd(M, M, mat.data(), u.data(), s.data(), vh.data()) < 0) return -1;

    // Discarded-weight truncation + norm preservation.
    double total2 = 0.0;
    for (int i = 0; i < M; ++i) total2 += s[i] * s[i];
    const double total = std::sqrt(total2);
    std::vector<double> tail(M + 1, 0.0);
    for (int i = M - 1; i >= 0; --i) tail[i] = tail[i + 1] + s[i] * s[i];
    double kept2 = 0.0;
    std::vector<double> s_kept(M, 0.0);
    for (int i = 0; i < M; ++i) {
        const bool keep = (std::sqrt(tail[i]) > trunc_thr * total) && (i < C);
        if (keep) {
            s_kept[i] = s[i];
            kept2 += s[i] * s[i];
        }
    }
    const double rescale = total / std::max(std::sqrt(kept2), 1e-300);
    for (int i = 0; i < C; ++i) out_lam_[i] = s_kept[i] * rescale;
    for (int i = C; i < M; ++i) s_kept[i] = 0.0;

    // Safe inverses of the outer lambdas.
    auto safe_inv = [](const double* lam, int nlam) {
        double mx = 0.0;
        for (int i = 0; i < nlam; ++i) mx = std::max(mx, lam[i]);
        const double thr = 1e-12 * std::max(mx, 1e-300);
        std::vector<double> inv(nlam, 0.0);
        for (int i = 0; i < nlam; ++i) inv[i] = lam[i] > thr ? 1.0 / lam[i] : 0.0;
        return inv;
    };
    const std::vector<double> inv_l = safe_inv(lam_l, C);
    const std::vector<double> inv_r = safe_inv(lam_r, C);

    // out_g1[s, a, k] = u[(s a), k] * inv_l[a]   (zero masked columns k >= C or dropped)
    std::memset(out_g1_, 0, sizeof(double) * 2 * (size_t)2 * C * C);
    std::memset(out_g2_, 0, sizeof(double) * 2 * (size_t)2 * C * C);
    for (int sft = 0; sft < 2; ++sft)
        for (int a = 0; a < C; ++a)
            for (int k = 0; k < C; ++k)
                out_g1[((size_t)sft * C + a) * C + k] =
                    (s_kept[k] > 0.0 ? u[((size_t)(sft * C + a)) * M + k] : cplx(0, 0)) *
                    inv_l[a];
    // out_g2[t, k, c] = vh[k, (t c)] * inv_r[c]
    for (int t = 0; t < 2; ++t)
        for (int k = 0; k < C; ++k)
            for (int c = 0; c < C; ++c)
                out_g2[((size_t)t * C + k) * C + c] =
                    (s_kept[k] > 0.0 ? vh[(size_t)k * M + (t * C + c)] : cplx(0, 0)) *
                    inv_r[c];
    return 0;
}

}  // extern "C"
