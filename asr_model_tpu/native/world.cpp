// WORLD-style F0 estimation: DIO + StoneMask, implemented from the
// published algorithms (Morise, "DIO: a fast and accurate fundamental
// frequency estimator", and the WORLD vocoder papers).
//
// Parity role: the reference's live pitch feature is pyworld's
// dio + stonemask at 10 ms frames (essentials.py:451-455).  pyworld is
// absent from this image, so this is a from-scratch C++ implementation
// of the same algorithms behind the same API; it is validated with
// algorithm-level tests (known-F0 tones, chirps, harmonic-rich signals
// with weak fundamentals, voicing on silence/noise) rather than
// bit-parity goldens, since no pyworld output can be generated here.
//
// Algorithm (DIO):
//  1. Low-cut the signal (smooth high-pass below 50 Hz) via one FFT.
//  2. For each band with boundary frequency f_b = floor * 2^((i+1)/c):
//     low-pass with a Nuttall-window kernel (cutoff ~ f_b), then
//     extract four interval-based period tracks (negative/positive
//     zero crossings of the signal and of its first difference).
//  3. Per frame: linearly interpolate the four tracks; the band's
//     candidate is their mean, its score the relative std.  Candidates
//     outside [f_b/2, f_b] or [floor, ceil] are rejected.
//  4. Per frame pick the minimum-score candidate, then fix the contour:
//     kill jumps > allowed_range, drop too-short voiced runs, and
//     extend voiced section edges with best-matching candidates from
//     the full band x frame candidate matrix.
//
// Algorithm (StoneMask): refine each voiced frame by the amplitude-
// weighted average of instantaneous frequencies at the first <=6
// harmonics, measured from a Blackman-windowed DFT around the frame
// (two refinement passes).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------- FFT
// Iterative radix-2 complex FFT (in-place), n a power of two.
void fft(std::vector<double>& re, std::vector<double>& im, bool inverse) {
  const size_t n = re.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = 2.0 * kPi / (double)len * (inverse ? 1.0 : -1.0);
    double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        double ur = re[i + k], ui = im[i + k];
        double vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        double vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;       im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr; im[i + k + len / 2] = ui - vi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;  cr = ncr;
      }
    }
  }
  if (inverse) {
    for (size_t i = 0; i < n; ++i) { re[i] /= (double)n; im[i] /= (double)n; }
  }
}

size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

double nuttall(double x) {  // x in [0, 1]
  return 0.355768 - 0.487396 * std::cos(2.0 * kPi * x)
       + 0.144232 * std::cos(4.0 * kPi * x)
       - 0.012604 * std::cos(6.0 * kPi * x);
}

// Linear interpolation of (xs, ys) at query q; clamps to the edges.
double interp1(const std::vector<double>& xs, const std::vector<double>& ys,
               double q) {
  if (xs.empty()) return 0.0;
  if (q <= xs.front()) return ys.front();
  if (q >= xs.back()) return ys.back();
  size_t lo = 0, hi = xs.size() - 1;
  while (hi - lo > 1) {
    size_t mid = (lo + hi) / 2;
    if (xs[mid] <= q) lo = mid; else hi = mid;
  }
  double w = (q - xs[lo]) / (xs[hi] - xs[lo]);
  return ys[lo] + w * (ys[hi] - ys[lo]);
}

// Interval-based period track from one kind of crossing event.
// events: sub-sample event locations (in samples).  Produces per-
// interval F0 values located at interval midpoints (in seconds).
struct IntervalTrack {
  std::vector<double> loc;  // seconds
  std::vector<double> f0;   // Hz
};

IntervalTrack intervals_from_events(const std::vector<double>& ev, int fs) {
  IntervalTrack tr;
  if (ev.size() < 2) return tr;
  tr.loc.reserve(ev.size() - 1);
  tr.f0.reserve(ev.size() - 1);
  for (size_t i = 0; i + 1 < ev.size(); ++i) {
    double interval = ev[i + 1] - ev[i];
    if (interval <= 0.0) continue;
    tr.f0.push_back((double)fs / interval);
    tr.loc.push_back(0.5 * (ev[i] + ev[i + 1]) / (double)fs);
  }
  return tr;
}

// Sub-sample locations of negative-going (sign=+1) or positive-going
// (sign=-1) zero crossings of y.
std::vector<double> zero_crossings(const std::vector<double>& y, int sign) {
  std::vector<double> ev;
  for (size_t k = 0; k + 1 < y.size(); ++k) {
    double a = y[k] * (double)sign, b = y[k + 1] * (double)sign;
    if (a > 0.0 && b <= 0.0)
      ev.push_back((double)k + a / (a - b));
  }
  return ev;
}

struct Candidates {
  // band-major: cand[band][frame], score[band][frame]
  std::vector<std::vector<double>> f0;
  std::vector<std::vector<double>> score;
};

constexpr double kBadScore = 100000.0;

// ------------------------------------------------------------- DIO core
void dio_candidates(const double* x, long long n, int fs,
                    const std::vector<double>& tpos,
                    double f0_floor, double f0_ceil,
                    double channels_in_octave, Candidates* out) {
  const int num_bands =
      (int)std::ceil(channels_in_octave * std::log2(f0_ceil / f0_floor));
  const size_t nf = tpos.size();
  out->f0.assign(num_bands, std::vector<double>(nf, 0.0));
  out->score.assign(num_bands, std::vector<double>(nf, kBadScore));

  // One forward FFT of the low-cut signal; per-band LPF in frequency
  // domain + inverse FFT.
  const size_t fft_n = next_pow2((size_t)n + (size_t)(4.0 * fs / f0_floor) + 2);
  std::vector<double> re(fft_n, 0.0), im(fft_n, 0.0);
  double mean = 0.0;
  for (long long i = 0; i < n; ++i) mean += x[i];
  mean = n > 0 ? mean / (double)n : 0.0;
  for (long long i = 0; i < n; ++i) re[(size_t)i] = x[i] - mean;
  fft(re, im, false);

  // smooth low-cut below 50 Hz (raised cosine 25..50 Hz)
  for (size_t k = 0; k < fft_n; ++k) {
    size_t kk = k <= fft_n / 2 ? k : fft_n - k;
    double f = (double)kk * fs / (double)fft_n;
    double g = f >= 50.0 ? 1.0
             : f <= 25.0 ? 0.0
             : 0.5 - 0.5 * std::cos(kPi * (f - 25.0) / 25.0);
    re[k] *= g;  im[k] *= g;
  }

  for (int b = 0; b < num_bands; ++b) {
    const double boundary =
        f0_floor * std::pow(2.0, (double)(b + 1) / channels_in_octave);
    const int half_avg = (int)std::lround((double)fs / boundary / 2.0);
    const int klen = std::max(4 * half_avg, 4);

    // Nuttall-window LPF kernel, unit DC gain, linear-phase shift
    // compensated by rotating the kernel to start at t=0.
    std::vector<double> kre(fft_n, 0.0), kim(fft_n, 0.0);
    double ksum = 0.0;
    for (int i = 0; i < klen; ++i) ksum += nuttall((double)i / (klen - 1));
    for (int i = 0; i < klen; ++i) {
      double w = nuttall((double)i / (klen - 1)) / ksum;
      // center the kernel at 0 (circular) so the filtered signal is
      // time-aligned with the input
      long long pos = (long long)i - klen / 2;
      size_t idx = (size_t)((pos % (long long)fft_n + (long long)fft_n)
                            % (long long)fft_n);
      kre[idx] += w;
    }
    fft(kre, kim, false);

    std::vector<double> yre(fft_n), yim(fft_n);
    for (size_t k = 0; k < fft_n; ++k) {
      yre[k] = re[k] * kre[k] - im[k] * kim[k];
      yim[k] = re[k] * kim[k] + im[k] * kre[k];
    }
    fft(yre, yim, true);

    std::vector<double> y(yre.begin(), yre.begin() + (size_t)n);
    std::vector<double> dy((size_t)std::max<long long>(n - 1, 0));
    for (size_t k = 0; k + 1 < (size_t)n; ++k) dy[k] = y[k + 1] - y[k];

    IntervalTrack tr[4] = {
        intervals_from_events(zero_crossings(y, +1), fs),   // neg-going
        intervals_from_events(zero_crossings(y, -1), fs),   // pos-going
        intervals_from_events(zero_crossings(dy, +1), fs),  // peaks
        intervals_from_events(zero_crossings(dy, -1), fs),  // dips
    };
    bool usable = true;
    for (auto& t : tr) usable = usable && t.f0.size() >= 2;
    if (!usable) continue;

    for (size_t i = 0; i < nf; ++i) {
      double v[4], avg = 0.0;
      for (int j = 0; j < 4; ++j) {
        v[j] = interp1(tr[j].loc, tr[j].f0, tpos[i]);
        avg += v[j];
      }
      avg *= 0.25;
      if (avg < f0_floor || avg > f0_ceil ||
          avg < boundary * 0.5 || avg > boundary)
        continue;
      double dev = 0.0;
      for (int j = 0; j < 4; ++j) dev += (v[j] - avg) * (v[j] - avg);
      out->f0[b][i] = avg;
      out->score[b][i] = std::sqrt(dev / 3.0) / avg;
    }
  }
}

// Best candidate per frame (minimum relative deviation).
void select_best(const Candidates& c, std::vector<double>* f0,
                 std::vector<double>* score) {
  const size_t nb = c.f0.size(), nf = f0->size();
  for (size_t i = 0; i < nf; ++i) {
    double best = kBadScore, bf = 0.0;
    for (size_t b = 0; b < nb; ++b) {
      if (c.score[b][i] < best) { best = c.score[b][i]; bf = c.f0[b][i]; }
    }
    // a stable period has all four interval estimates in agreement;
    // reject frames whose best relative deviation is still large
    (*f0)[i] = best < 0.12 ? bf : 0.0;
    (*score)[i] = best;
  }
}

// Best candidate at frame i within allowed_range of reference.
double select_near(const Candidates& c, size_t i, double ref,
                   double allowed_range) {
  double best_err = allowed_range, best = 0.0;
  for (size_t b = 0; b < c.f0.size(); ++b) {
    double v = c.f0[b][i];
    if (v <= 0.0) continue;
    double err = std::fabs(v - ref) / ref;
    if (err < best_err) { best_err = err; best = v; }
  }
  return best;
}

void fix_contour(const Candidates& cands, double frame_period,
                 double f0_floor, double allowed_range,
                 std::vector<double>* f0) {
  const size_t nf = f0->size();
  if (nf == 0) return;

  // step 1: kill relative jumps beyond allowed_range
  std::vector<double> s1 = *f0;
  for (size_t i = 1; i < nf; ++i) {
    if ((*f0)[i] <= 0.0 || (*f0)[i - 1] <= 0.0) continue;
    double jump = std::fabs((*f0)[i] - (*f0)[i - 1]) / (*f0)[i];
    if (jump > allowed_range) s1[i] = 0.0;
  }

  // step 2: drop voiced runs shorter than voice_range_minimum
  const int vrm =
      (int)(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1;
  std::vector<double> s2 = s1;
  size_t i = 0;
  while (i < nf) {
    if (s1[i] <= 0.0) { ++i; continue; }
    size_t j = i;
    while (j < nf && s1[j] > 0.0) ++j;
    if ((int)(j - i) < vrm)
      for (size_t k = i; k < j; ++k) s2[k] = 0.0;
    i = j;
  }

  // steps 3+4: extend voiced sections forward/backward using the
  // candidate matrix (best candidate within allowed_range of the edge)
  std::vector<double> s3 = s2;
  i = 0;
  while (i < nf) {
    if (s2[i] <= 0.0) { ++i; continue; }
    size_t j = i;
    while (j < nf && s2[j] > 0.0) ++j;
    double ref = s3[j - 1];
    for (size_t k = j; k < nf && s2[k] <= 0.0; ++k) {   // forward
      double v = select_near(cands, k, ref, allowed_range);
      if (v <= 0.0) break;
      s3[k] = v;  ref = v;
    }
    ref = s3[i];
    for (size_t k = i; k-- > 0 && s2[k] <= 0.0;) {       // backward
      double v = select_near(cands, k, ref, allowed_range);
      if (v <= 0.0) break;
      s3[k] = v;  ref = v;
    }
    i = j;
  }
  *f0 = s3;
}

// -------------------------------------------------------- StoneMask core
// One instantaneous-frequency refinement pass at frame time tpos.
double refine_once(const double* x, long long n, int fs, double tpos,
                   double f0) {
  if (f0 <= 0.0) return 0.0;
  const int half = (int)(1.5 * fs / f0 + 0.5);
  const int wlen = 2 * half + 1;
  const size_t fft_n = next_pow2((size_t)wlen) * 2;
  const long long center = (long long)std::lround(tpos * fs);
  // a truncated window biases the instantaneous-frequency estimate;
  // keep the DIO value at the signal edges instead of refining there
  if (center - half < 0 || center + half >= n) return 0.0;

  std::vector<double> wre(fft_n, 0.0), wim(fft_n, 0.0);
  std::vector<double> dre(fft_n, 0.0), dim_(fft_n, 0.0);
  std::vector<double> win(wlen), dwin(wlen);
  for (int i = 0; i < wlen; ++i) {
    // Blackman window spanning three periods of f0
    double t = (double)(i - half) * f0 / (1.5 * fs);   // in [-1, 1]
    win[i] = 0.42 + 0.5 * std::cos(kPi * t) + 0.08 * std::cos(2.0 * kPi * t);
  }
  for (int i = 0; i < wlen; ++i) {
    double prev = i > 0 ? win[i - 1] : 0.0;
    double next = i + 1 < wlen ? win[i + 1] : 0.0;
    dwin[i] = -(next - prev) / 2.0;
  }
  for (int i = 0; i < wlen; ++i) {
    long long k = center - half + i;
    double s = (k >= 0 && k < n) ? x[k] : 0.0;
    wre[(size_t)i] = s * win[i];
    dre[(size_t)i] = s * dwin[i];
  }
  fft(wre, wim, false);
  fft(dre, dim_, false);

  const int harmonics = std::min((int)(0.5 * fs / f0), 6);
  if (harmonics < 1) return 0.0;
  double num = 0.0, den = 0.0;
  for (int h = 1; h <= harmonics; ++h) {
    size_t k = (size_t)std::lround(h * f0 / fs * (double)fft_n);
    if (k >= fft_n / 2) break;
    double power = wre[k] * wre[k] + wim[k] * wim[k];
    if (power <= 1e-30) continue;
    // flat-top instantaneous frequency estimator:
    // IF = f_k + Im{X'(k) * conj(X(k))} / |X(k)|^2 * fs / (2*pi)
    double fk = (double)k * fs / (double)fft_n;
    double cross = dre[k] * (-wim[k]) + dim_[k] * wre[k];
    double inst = fk + cross / power * fs / (2.0 * kPi);
    double amp = std::sqrt(power);
    num += inst * amp;
    den += amp * (double)h;
  }
  if (den <= 0.0) return 0.0;
  return num / den;
}

}  // namespace

extern "C" {

// Frame times and F0 (0 = unvoiced); out arrays must hold n_frames
// doubles where n_frames = (long long)(1000.0 * n / fs / frame_period) + 1.
// Returns the number of frames written, or -1 on bad arguments.
long long world_dio(const double* x, long long n, int fs,
                    double frame_period, double f0_floor, double f0_ceil,
                    double channels_in_octave, double allowed_range,
                    double* out_f0, double* out_t) {
  if (!x || n <= 0 || fs <= 0 || frame_period <= 0.0 ||
      f0_floor <= 0.0 || f0_ceil <= f0_floor || !out_f0 || !out_t)
    return -1;
  const long long nf =
      (long long)(1000.0 * (double)n / fs / frame_period) + 1;
  std::vector<double> tpos((size_t)nf);
  for (long long i = 0; i < nf; ++i)
    tpos[(size_t)i] = (double)i * frame_period / 1000.0;

  Candidates cands;
  dio_candidates(x, n, fs, tpos, f0_floor, f0_ceil, channels_in_octave,
                 &cands);
  std::vector<double> f0((size_t)nf, 0.0), score((size_t)nf, kBadScore);
  select_best(cands, &f0, &score);
  fix_contour(cands, frame_period, f0_floor, allowed_range, &f0);

  std::memcpy(out_f0, f0.data(), sizeof(double) * (size_t)nf);
  std::memcpy(out_t, tpos.data(), sizeof(double) * (size_t)nf);
  return nf;
}

// StoneMask refinement: two instantaneous-frequency passes per voiced
// frame; a refinement drifting > 18% from the input estimate (or out of
// a plausible range) keeps the frame unvoiced-safe by zeroing it.
int world_stonemask(const double* x, long long n, int fs,
                    const double* f0, const double* t, long long n_frames,
                    double* out_f0) {
  if (!x || n <= 0 || fs <= 0 || !f0 || !t || n_frames <= 0 || !out_f0)
    return -1;
  for (long long i = 0; i < n_frames; ++i) {
    double cur = f0[i];
    if (cur <= 0.0) { out_f0[i] = 0.0; continue; }
    double r1 = refine_once(x, n, fs, t[i], cur);
    double r2 = r1 > 0.0 ? refine_once(x, n, fs, t[i], r1) : 0.0;
    double refined = r2 > 0.0 ? r2 : r1;
    if (refined <= 0.0 || std::fabs(refined - cur) > 0.18 * cur)
      out_f0[i] = cur;   // keep the DIO estimate when refinement strays
    else
      out_f0[i] = refined;
  }
  return 0;
}

}  // extern "C"
