// styler_dsp: native host-side DSP for the styler_tpu preprocessing pipeline.
//
// Implements the f0 (fundamental frequency) tracker consumed by
// styler_tpu/dsp/pitch.py via ctypes. The algorithm is the same
// NCCF (normalized cross-correlation) tracker as the pure-numpy golden
// model in that module: per hop-aligned frame, correlate a ~2.5-period
// window against lagged copies over [sr/f0_max, sr/f0_min], peak-pick
// with parabolic refinement, threshold voicing, median-3 smooth.
//
// The reference delegates this capability to external native libraries
// (pyworld DIO for clean speech, reference dataset.py:32-37; pysptk RAPT
// for noisy, dataset.py:40-45). This is a from-scratch implementation of
// the same contract, multithreaded for preprocessing throughput
// (BASELINE.md config 5).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// median of the voiced (positive) entries of a 3-window
double median_voiced3(const double* w) {
  double v[3];
  int n = 0;
  for (int j = 0; j < 3; ++j)
    if (w[j] > 0) v[n++] = w[j];
  std::sort(v, v + n);
  if (n == 1) return v[0];
  if (n == 2) return 0.5 * (v[0] + v[1]);
  return v[1];
}

void track_f0_impl(const float* signal, int n, int sr, int hop, float f0_min,
                   float f0_max, int robust, float* out_f0, int n_threads) {
  const int n_frames = n / hop + 1;
  std::vector<double> x(n);
  double mean = 0.0;
  for (int i = 0; i < n; ++i) mean += signal[i];
  mean /= std::max(1, n);
  double global_peak = 0.0;
  for (int i = 0; i < n; ++i) {
    x[i] = signal[i] - mean;
    global_peak = std::max(global_peak, std::fabs(x[i]));
  }
  global_peak += 1e-12;

  const int lag_min = std::max(2, (int)(sr / f0_max));
  const int lag_max = std::min((int)(sr / f0_min) + 1, n - 1);
  const int win = (int)std::min(2.5 * lag_max, 4.0 * hop);
  const double thresh = robust ? 0.50 : 0.45;

  std::vector<double> f0(n_frames, 0.0);

  // prefix sum of x^2 for O(1) lagged-energy terms
  std::vector<double> csum(n + 1, 0.0);
  for (int i = 0; i < n; ++i) csum[i + 1] = csum[i] + x[i] * x[i];

  auto process_range = [&](int f_begin, int f_end) {
    for (int i = f_begin; i < f_end; ++i) {
      const int center = i * hop;
      const int start = std::max(0, center - win / 2);
      const int seg_len = std::min(win + lag_max, n - start);
      if (seg_len < lag_min + 8) continue;
      const double* seg = &x[start];
      const int w = std::min(win, seg_len);
      if (w < win) continue;  // matches numpy: frame = seg[:win] must be full

      double e0 = 0.0, frame_peak = 0.0;
      for (int t = 0; t < win; ++t) {
        e0 += seg[t] * seg[t];
        frame_peak = std::max(frame_peak, std::fabs(seg[t]));
      }
      if (e0 < 1e-10 || frame_peak < 0.02 * global_peak) continue;

      const int max_lag = std::min(lag_max, seg_len - win);
      if (max_lag <= lag_min) continue;

      // direct NCCF over the candidate band (numpy model uses FFT; the
      // direct double-precision sum agrees to ~1e-12)
      double best_score = -2.0;
      std::vector<double> nccf(max_lag + 1, -2.0);
      for (int k = lag_min > 0 ? lag_min - 1 : 0; k <= max_lag; ++k) {
        double cross = 0.0;
        for (int t = 0; t < win; ++t) cross += seg[t] * seg[t + k];
        const double e_k = csum[start + k + win] - csum[start + k];
        nccf[k] = cross / std::sqrt(e0 * std::max(e_k, 1e-10));
        if (k >= lag_min && nccf[k] > best_score) best_score = nccf[k];
      }
      if (best_score < thresh) continue;
      // Octave guard (matches the numpy golden model): smallest-lag
      // LOCAL MAXIMUM within kOctaveDelta of the best score wins.
      // Subharmonic lags (2T, 3T...) tie with the true period — and at
      // non-integer periods the subharmonic lands nearer an integer lag
      // and scores strictly higher, so a tiny epsilon is not enough.
      const double kOctaveDelta = 0.045;
      const double floor_score =
          std::max(best_score - kOctaveDelta, (double)thresh);
      int best_k = -1;
      for (int k = lag_min; k <= max_lag; ++k) {
        // band edges pad with -2 exactly like the numpy golden model
        const double left = (k > lag_min) ? nccf[k - 1] : -2.0;
        const double right = (k < max_lag) ? nccf[k + 1] : -2.0;
        if (nccf[k] >= floor_score && nccf[k] >= left && nccf[k] >= right) {
          best_k = k;
          break;
        }
      }
      if (best_k < 0) continue;

      double delta = 0.0;
      if (best_k > 0 && best_k < max_lag) {
        const double y0 = nccf[best_k - 1], y1 = nccf[best_k],
                     y2 = nccf[best_k + 1];
        const double denom = y0 - 2 * y1 + y2;
        if (std::fabs(denom) > 1e-12) delta = 0.5 * (y0 - y2) / denom;
        delta = std::min(0.5, std::max(-0.5, delta));
      }
      f0[i] = sr / (best_k + delta);
    }
  };

  if (n_threads <= 1 || n_frames < 32) {
    process_range(0, n_frames);
  } else {
    const int nt = std::min(n_threads, 16);
    std::vector<std::thread> pool;
    const int chunk = (n_frames + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      const int b = t * chunk, e = std::min(n_frames, b + chunk);
      if (b < e) pool.emplace_back(process_range, b, e);
    }
    for (auto& th : pool) th.join();
  }

  // median-3 smoothing; kill isolated voiced frames (same as numpy model)
  std::vector<double> sm(f0);
  for (int i = 1; i + 1 < n_frames; ++i) {
    const double* w3 = &f0[i - 1];
    int voiced = (w3[0] > 0) + (w3[1] > 0) + (w3[2] > 0);
    if (f0[i] > 0 && voiced >= 2)
      sm[i] = median_voiced3(w3);
    else if (f0[i] > 0 && voiced == 1)
      sm[i] = 0.0;
  }
  for (int i = 0; i < n_frames; ++i) {
    const double v = sm[i];
    out_f0[i] = (v >= f0_min && v <= f0_max) ? (float)v : 0.0f;
  }
}

}  // namespace

extern "C" {

// Single-utterance tracker; out_f0 must hold n/hop + 1 floats. Returns 0.
int styler_track_f0(const float* signal, int n, int sr, int hop, float f0_min,
                    float f0_max, int robust, float* out_f0) {
  if (!signal || !out_f0 || n <= 0 || hop <= 0 || sr <= 0 || f0_min <= 0 ||
      f0_max <= f0_min)
    return 1;
  unsigned hw = std::thread::hardware_concurrency();
  track_f0_impl(signal, n, sr, hop, f0_min, f0_max, robust, out_f0,
                hw ? (int)hw : 1);
  return 0;
}

// Batch tracker: signals concatenated, lengths[i] samples each; outputs
// concatenated per-utterance (lengths[i]/hop + 1 frames). One thread per
// utterance — the preprocessing-throughput path.
int styler_track_f0_batch(const float* signals, const int* lengths,
                          int n_utts, int sr, int hop, float f0_min,
                          float f0_max, int robust, float* out_f0) {
  if (!signals || !lengths || !out_f0 || n_utts <= 0) return 1;
  std::vector<long> in_off(n_utts + 1, 0), out_off(n_utts + 1, 0);
  for (int i = 0; i < n_utts; ++i) {
    if (lengths[i] <= 0) return 1;
    in_off[i + 1] = in_off[i] + lengths[i];
    out_off[i + 1] = out_off[i] + lengths[i] / hop + 1;
  }
  unsigned hw = std::thread::hardware_concurrency();
  const int nt = std::max(1u, std::min(hw, 16u));
  std::atomic<int> next{0};
  std::atomic<int> err{0};
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n_utts) return;
      track_f0_impl(signals + in_off[i], lengths[i], sr, hop, f0_min, f0_max,
                    robust, out_f0 + out_off[i], /*n_threads=*/1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

}  // extern "C"

// ---------------------------------------------------------------------
// Rational polyphase resampler (windowed-sinc, Kaiser beta 5.0).
//
// Replaces the reference's ffmpeg shell-out (reference data/resample.sh)
// for wav inputs: sr_in -> sr_out via upsample-by-L / FIR / decimate-by-M
// with the exact filter design of scipy.signal.resample_poly's default
// (firwin(2*10*max(L,M)+1, 1/max(L,M), kaiser 5.0), DC gain 1) so the
// Python golden test can pin it numerically.
// ---------------------------------------------------------------------

namespace {

double bessel_i0(double x) {
  // series expansion; converges fast for the beta*<=1 arguments used here
  double sum = 1.0, term = 1.0;
  const double half_x = 0.5 * x;
  for (int k = 1; k < 64; ++k) {
    term *= (half_x / k) * (half_x / k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

long gcd_long(long a, long b) { return b ? gcd_long(b, a % b) : a; }

void resample_impl(const float* in, long n_in, long up, long down, float* out,
                   long n_out, int n_threads) {
  // scipy resample_poly filter design
  const long max_rate = std::max(up, down);
  const double f_c = 1.0 / (double)max_rate;
  const long half_len = 10 * max_rate;
  const long n_taps = 2 * half_len + 1;
  std::vector<double> h(n_taps);
  const double beta = 5.0;
  const double i0b = bessel_i0(beta);
  double dc = 0.0;
  for (long k = 0; k < n_taps; ++k) {
    const double m = (double)(k - half_len);
    const double sinc =
        m == 0.0 ? 1.0 : std::sin(M_PI * f_c * m) / (M_PI * f_c * m);
    const double r = m / (double)half_len;  // in [-1, 1]
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r)));
    h[k] = f_c * sinc * (w / i0b);
    dc += h[k];
  }
  for (long k = 0; k < n_taps; ++k) h[k] = h[k] / dc * (double)up;

  // y[n] = sum_k h[k] * x_up[n*down + half_len - k]  (centered filter:
  // scipy pre-pads h and drops the first (half_len+pad)/down outputs;
  // folding the shift into the tap index is equivalent)
  auto compute = [&](long n0, long n1) {
    for (long n = n0; n < n1; ++n) {
      const long p = n * down + half_len;  // upsampled-domain index
      long j_lo = (p - n_taps + 1 + up - 1) / up;  // ceil
      if (j_lo < 0) j_lo = 0;
      long j_hi = p / up;  // floor
      if (j_hi > n_in - 1) j_hi = n_in - 1;
      double acc = 0.0;
      for (long j = j_lo; j <= j_hi; ++j)
        acc += h[p - j * up] * (double)in[j];
      out[n] = (float)acc;
    }
  };

  if (n_threads <= 1 || n_out < 4096) {
    compute(0, n_out);
    return;
  }
  std::vector<std::thread> pool;
  const long chunk = (n_out + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const long a = t * chunk, b = std::min(n_out, a + chunk);
    if (a < b) pool.emplace_back(compute, a, b);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Resampled length for n_in samples at sr_in -> sr_out (scipy
// resample_poly convention: ceil(n_in * up / down) after gcd reduction).
long styler_resample_len(long n_in, int sr_in, int sr_out) {
  if (n_in <= 0 || sr_in <= 0 || sr_out <= 0) return -1;
  const long g = gcd_long(sr_in, sr_out);
  const long up = sr_out / g, down = sr_in / g;
  return (n_in * up + down - 1) / down;
}

// out must hold styler_resample_len(...) floats. Returns 0 on success.
int styler_resample(const float* in, long n_in, int sr_in, int sr_out,
                    float* out) {
  const long n_out = styler_resample_len(n_in, sr_in, sr_out);
  if (!in || !out || n_out < 0) return 1;
  const long g = gcd_long(sr_in, sr_out);
  const long up = sr_out / g, down = sr_in / g;
  if (up == 1 && down == 1) {
    std::memcpy(out, in, n_in * sizeof(float));
    return 0;
  }
  unsigned hw = std::thread::hardware_concurrency();
  resample_impl(in, n_in, up, down, out, n_out, hw ? (int)hw : 1);
  return 0;
}

}  // extern "C"
