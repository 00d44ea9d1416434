// Permutohedral-lattice dense CRF (Adams et al. 2010; Krähenbühl &
// Koltun 2011), implemented fresh for the equss_tpu runtime.
//
// Native equivalent of the pydensecrf dependency consumed by the
// reference at /root/reference/utils/crf_utils.py:32-55 (DenseCRF2D with
// a Gaussian pairwise sxy=1/compat=3 and a bilateral pairwise
// sxy=67/srgb=3/compat=4, 10 mean-field iterations).  The exact
// O(N^2) JAX path (equss_tpu/ops/crf.py) is the TPU fast path; this
// library provides the host-side approximate-filtering path for
// CPU-only deployments and for cross-checking, exposed through a plain
// C ABI (ctypes — no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpermutohedral.so permutohedral.cpp
//
// The lattice: embed d-dim features on the hyperplane H_d of the
// permutohedral lattice A_d, splat each point onto the d+1 vertices of
// its enclosing simplex with barycentric weights, blur along each of
// the d+1 lattice directions with a [1,2,1]/4 kernel, and slice back.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <unordered_map>
#include <vector>

namespace {

// Hash for lattice keys (d int16 coordinates).
struct KeyHash {
    size_t operator()(const std::vector<short>& k) const {
        size_t h = 0;
        for (short v : k) h = h * 2531011u + static_cast<size_t>(v + 32768);
        return h;
    }
};

class Permutohedral {
  public:
    // positions: (n, d) feature vectors (already sigma-normalized)
    void init(const float* positions, int n, int d) {
        n_ = n;
        d_ = d;
        offsets_.assign(static_cast<size_t>(n) * (d + 1), 0);
        weights_.assign(static_cast<size_t>(n) * (d + 1), 0.f);

        std::vector<float> elevated(d + 1);
        std::vector<float> rem0(d + 1);
        std::vector<short> rank(d + 1);
        std::vector<short> key(d);
        std::vector<float> barycentric(d + 2);

        // scale so that lattice spacing matches unit-variance Gaussians
        // (Adams et al.: invStdDev = sqrt(2/3)*(d+1),
        //  scale[i] = invStdDev / sqrt((i+1)*(i+2)))
        std::vector<float> scale(d);
        const float inv_std = std::sqrt(2.0f / 3.0f) * (d + 1);
        for (int i = 0; i < d; ++i)
            scale[i] = inv_std /
                       std::sqrt(static_cast<float>((i + 1) * (i + 2)));

        std::unordered_map<std::vector<short>, int, KeyHash> table;
        table.reserve(static_cast<size_t>(n) * 2);

        for (int p = 0; p < n; ++p) {
            const float* f = positions + static_cast<size_t>(p) * d;
            // E(f): embed onto the hyperplane sum(x)=0 (Adams et al. eq. 6)
            float sm = 0.f;
            for (int j = d; j > 0; --j) {
                float cf = f[j - 1] * scale[j - 1];
                elevated[j] = sm - j * cf;
                sm += cf;
            }
            elevated[0] = sm;

            // nearest zero-colored lattice point
            const int down_factor = d + 1;
            int sum = 0;
            for (int i = 0; i <= d; ++i) {
                float v = elevated[i] / down_factor;
                float up = std::ceil(v) * down_factor;
                float down = std::floor(v) * down_factor;
                rem0[i] = (up - elevated[i] < elevated[i] - down) ? up : down;
                sum += static_cast<int>(rem0[i]) / down_factor;
            }

            // rank differential coordinates
            for (int i = 0; i <= d; ++i) rank[i] = 0;
            for (int i = 0; i < d; ++i)
                for (int j = i + 1; j <= d; ++j) {
                    double di = elevated[i] - rem0[i];
                    double dj = elevated[j] - rem0[j];
                    if (di < dj) ++rank[i];
                    else ++rank[j];
                }

            // walk back onto H_d if the point is off the hyperplane
            if (sum > 0) {
                for (int i = 0; i <= d; ++i) {
                    if (rank[i] >= d + 1 - sum) {
                        rem0[i] -= down_factor;
                        rank[i] += sum - (d + 1);
                    } else {
                        rank[i] += sum;
                    }
                }
            } else if (sum < 0) {
                for (int i = 0; i <= d; ++i) {
                    if (rank[i] < -sum) {
                        rem0[i] += down_factor;
                        rank[i] += sum + (d + 1);
                    } else {
                        rank[i] += sum;
                    }
                }
            }

            // barycentric coordinates
            for (int i = 0; i <= d + 1; ++i) barycentric[i] = 0.f;
            for (int i = 0; i <= d; ++i) {
                float delta = (elevated[i] - rem0[i]) / down_factor;
                barycentric[d - rank[i]] += delta;
                barycentric[d + 1 - rank[i]] -= delta;
            }
            barycentric[0] += 1.0f + barycentric[d + 1];

            // splat targets: the d+1 simplex vertices
            for (int rem = 0; rem <= d; ++rem) {
                for (int i = 0; i < d; ++i) {
                    key[i] = static_cast<short>(
                        rem0[i] + (rank[i] >= d + 1 - rem
                                       ? rem - (d + 1)
                                       : rem));
                }
                auto it = table.find(key);
                int idx;
                if (it == table.end()) {
                    idx = static_cast<int>(table.size());
                    table.emplace(key, idx);
                    keys_.insert(keys_.end(), key.begin(), key.end());
                } else {
                    idx = it->second;
                }
                offsets_[static_cast<size_t>(p) * (d + 1) + rem] = idx;
                weights_[static_cast<size_t>(p) * (d + 1) + rem] =
                    barycentric[rem];
            }
        }
        m_ = static_cast<int>(table.size());

        // blur neighbors along each lattice direction, precomputed
        blur_n1_.assign(static_cast<size_t>(m_) * (d + 1), -1);
        blur_n2_.assign(static_cast<size_t>(m_) * (d + 1), -1);
        std::vector<short> np1(d), np2(d);
        for (int i = 0; i < m_; ++i) {
            const short* k = &keys_[static_cast<size_t>(i) * d];
            for (int j = 0; j <= d; ++j) {
                for (int a = 0; a < d; ++a) {
                    np1[a] = static_cast<short>(k[a] + 1);
                    np2[a] = static_cast<short>(k[a] - 1);
                }
                if (j < d) {
                    np1[j] = static_cast<short>(k[j] - d);
                    np2[j] = static_cast<short>(k[j] + d);
                }
                auto i1 = table.find(np1);
                auto i2 = table.find(np2);
                blur_n1_[static_cast<size_t>(i) * (d + 1) + j] =
                    (i1 == table.end()) ? -1 : i1->second;
                blur_n2_[static_cast<size_t>(i) * (d + 1) + j] =
                    (i2 == table.end()) ? -1 : i2->second;
            }
        }
    }

    // filter values (n, vd) -> out (n, vd): splat + blur + slice
    void compute(const float* values, float* out, int vd) const {
        std::vector<float> lat(static_cast<size_t>(m_ + 1) * vd, 0.f);
        // splat
        for (int p = 0; p < n_; ++p) {
            for (int r = 0; r <= d_; ++r) {
                int o = offsets_[static_cast<size_t>(p) * (d_ + 1) + r];
                float w = weights_[static_cast<size_t>(p) * (d_ + 1) + r];
                float* dst = &lat[static_cast<size_t>(o) * vd];
                const float* src = values + static_cast<size_t>(p) * vd;
                for (int c = 0; c < vd; ++c) dst[c] += w * src[c];
            }
        }
        // blur along each direction ([1,2,1] kernel)
        std::vector<float> nxt(static_cast<size_t>(m_ + 1) * vd, 0.f);
        std::vector<float>* cur = &lat;
        std::vector<float>* nx = &nxt;
        for (int j = 0; j <= d_; ++j) {
            for (int i = 0; i < m_; ++i) {
                const float* c0 = &(*cur)[static_cast<size_t>(i) * vd];
                int i1 = blur_n1_[static_cast<size_t>(i) * (d_ + 1) + j];
                int i2 = blur_n2_[static_cast<size_t>(i) * (d_ + 1) + j];
                const float* c1 =
                    &(*cur)[static_cast<size_t>(i1 < 0 ? m_ : i1) * vd];
                const float* c2 =
                    &(*cur)[static_cast<size_t>(i2 < 0 ? m_ : i2) * vd];
                float* dst = &(*nx)[static_cast<size_t>(i) * vd];
                for (int c = 0; c < vd; ++c)
                    dst[c] = 0.25f * (c1[c] + 2.f * c0[c] + c2[c]);
            }
            std::swap(cur, nx);
        }
        // slice (with the alternating-vertex weight 2^-d correction
        // folded into barycentric weights already normalized)
        const float alpha = 1.0f / (1 + std::pow(2.0f, -d_));
        for (int p = 0; p < n_; ++p) {
            float* dst = out + static_cast<size_t>(p) * vd;
            for (int c = 0; c < vd; ++c) dst[c] = 0.f;
            for (int r = 0; r <= d_; ++r) {
                int o = offsets_[static_cast<size_t>(p) * (d_ + 1) + r];
                float w = weights_[static_cast<size_t>(p) * (d_ + 1) + r];
                const float* src = &(*cur)[static_cast<size_t>(o) * vd];
                for (int c = 0; c < vd; ++c) dst[c] += alpha * w * src[c];
            }
        }
    }

  private:
    int n_ = 0, d_ = 0, m_ = 0;
    std::vector<int> offsets_;
    std::vector<float> weights_;
    std::vector<short> keys_;
    std::vector<int> blur_n1_, blur_n2_;
};

void softmax_rows(float* x, int n, int c) {
    for (int i = 0; i < n; ++i) {
        float* row = x + static_cast<size_t>(i) * c;
        float mx = row[0];
        for (int j = 1; j < c; ++j) mx = std::max(mx, row[j]);
        float s = 0.f;
        for (int j = 0; j < c; ++j) {
            row[j] = std::exp(row[j] - mx);
            s += row[j];
        }
        float inv = 1.0f / s;
        for (int j = 0; j < c; ++j) row[j] *= inv;
    }
}

}  // namespace

extern "C" {

// Dense CRF mean-field inference for one image.
//   log_probs: (H*W, C) unary log-probabilities (log-softmax)
//   rgb:       (H*W, 3) floats in [0, 255]
//   out:       (H*W, C) refined probabilities
int dense_crf_inference(
    const float* log_probs, const float* rgb, int H, int W, int C,
    int n_iter, float pos_w, float pos_xy_std, float bi_w, float bi_xy_std,
    float bi_rgb_std, float* out) {
    const int n = H * W;

    // build feature sets
    std::vector<float> f_sp(static_cast<size_t>(n) * 2);
    std::vector<float> f_bi(static_cast<size_t>(n) * 5);
    for (int y = 0; y < H; ++y)
        for (int x = 0; x < W; ++x) {
            int p = y * W + x;
            f_sp[p * 2 + 0] = x / pos_xy_std;
            f_sp[p * 2 + 1] = y / pos_xy_std;
            f_bi[p * 5 + 0] = x / bi_xy_std;
            f_bi[p * 5 + 1] = y / bi_xy_std;
            for (int c = 0; c < 3; ++c)
                f_bi[p * 5 + 2 + c] = rgb[p * 3 + c] / bi_rgb_std;
        }

    Permutohedral lat_sp, lat_bi;
    lat_sp.init(f_sp.data(), n, 2);
    lat_bi.init(f_bi.data(), n, 5);

    // symmetric normalization degrees (filter of ones)
    std::vector<float> ones(n, 1.f), deg_sp(n), deg_bi(n);
    lat_sp.compute(ones.data(), deg_sp.data(), 1);
    lat_bi.compute(ones.data(), deg_bi.data(), 1);
    for (int i = 0; i < n; ++i) {
        deg_sp[i] = 1.0f / std::sqrt(std::max(deg_sp[i], 1e-20f));
        deg_bi[i] = 1.0f / std::sqrt(std::max(deg_bi[i], 1e-20f));
    }

    std::vector<float> q(log_probs, log_probs + static_cast<size_t>(n) * C);
    softmax_rows(q.data(), n, C);
    std::vector<float> tmp(static_cast<size_t>(n) * C);
    std::vector<float> msg_sp(static_cast<size_t>(n) * C);
    std::vector<float> msg_bi(static_cast<size_t>(n) * C);

    for (int it = 0; it < n_iter; ++it) {
        for (int i = 0; i < n; ++i)
            for (int c = 0; c < C; ++c)
                tmp[static_cast<size_t>(i) * C + c] =
                    q[static_cast<size_t>(i) * C + c] * deg_sp[i];
        lat_sp.compute(tmp.data(), msg_sp.data(), C);
        for (int i = 0; i < n; ++i)
            for (int c = 0; c < C; ++c)
                tmp[static_cast<size_t>(i) * C + c] =
                    q[static_cast<size_t>(i) * C + c] * deg_bi[i];
        lat_bi.compute(tmp.data(), msg_bi.data(), C);

        // NB: like pydensecrf, the message includes the self term (the
        // paper notes it has no significant effect); with the lattice's
        // arbitrary constant scale an explicit self-subtraction would
        // need the unknown scale factor and corrupts the field.
        for (int i = 0; i < n; ++i) {
            for (int c = 0; c < C; ++c) {
                size_t idx = static_cast<size_t>(i) * C + c;
                float m_sp = msg_sp[idx] * deg_sp[i];
                float m_bi = msg_bi[idx] * deg_bi[i];
                q[idx] = log_probs[idx] + pos_w * m_sp + bi_w * m_bi;
            }
        }
        softmax_rows(q.data(), n, C);
    }
    std::memcpy(out, q.data(), static_cast<size_t>(n) * C * sizeof(float));
    return 0;
}

// Standalone lattice filter (for tests): values (n, vd) filtered by a
// Gaussian kernel over features (n, fd).
int permutohedral_filter(
    const float* features, const float* values, int n, int fd, int vd,
    float* out) {
    Permutohedral lat;
    lat.init(features, n, fd);
    lat.compute(values, out, vd);
    return 0;
}

}  // extern "C"
