"""Independent NumPy reference implementations of the audio front-ends.

Written directly from the published formulas (librosa/whisper/torchaudio/
kaldi conventions) using np.fft.rfft — a different algorithm than the
framework's DFT-matmul path — so parity tests cross-validate both the
filterbank construction and the STFT itself.
"""

import numpy as np


def hann_sym(n):
    return 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / (n - 1)))


def hann_periodic(n):
    return 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))


def hamming(n):
    return 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))


def stft_np(x, window, n_fft, hop, center=True):
    if center:
        x = np.pad(x, n_fft // 2, mode="reflect")
    num_frames = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(num_frames)])
    return np.fft.rfft(frames * window, axis=-1)


def mel_fb_slaney(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    fmax = sr / 2 if fmax is None else fmax

    def hz2mel(hz):
        hz = np.asarray(hz, dtype=np.float64)
        return np.where(hz >= 1000, 15 + np.log(np.maximum(hz, 1e-12) / 1000) / (np.log(6.4) / 27),
                        hz * 3 / 200)

    def mel2hz(m):
        m = np.asarray(m, dtype=np.float64)
        return np.where(m >= 15, 1000 * np.exp((np.log(6.4) / 27) * (m - 15)), m * 200 / 3)

    mels = np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2)
    hz = mel2hz(mels)
    freqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, c, hi = hz[m], hz[m + 1], hz[m + 2]
        fb[m] = np.clip(np.minimum((freqs - lo) / (c - lo), (hi - freqs) / (hi - c)), 0, None)
        fb[m] *= 2.0 / (hi - lo)
    return fb


def whisper_log_mel_np(audio, n_mels=80, padding=0):
    if padding:
        audio = np.pad(audio, (0, padding))
    spec = stft_np(audio, hann_sym(400), 400, 160)
    power = np.abs(spec[:-1]) ** 2
    mel = power @ mel_fb_slaney(16000, 400, n_mels, fmax=8000).T
    log = np.log10(np.maximum(mel, 1e-10))
    log = np.maximum(log, log.max() - 8.0)
    return (log + 4.0) / 4.0


def funasr_log_mel_np(audio, n_mels=80):
    spec = stft_np(audio, hamming(400), 400, 160)
    power = np.abs(spec[:, :200]) ** 2
    # torchaudio-style HTK triangles over linspace(0, sr/2, n_fft//2)
    all_freqs = np.linspace(0, 8000, 200)
    m_pts = np.linspace(2595 * np.log10(1 + 0 / 700), 2595 * np.log10(1 + 8000 / 700), n_mels + 2)
    f_pts = 700 * (10 ** (m_pts / 2595) - 1)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0, np.minimum(down, up))
    mel = power @ fb
    return np.log(np.maximum(mel, 1e-10))


def lfr_np(feats, m=7, n=6):
    t, d = feats.shape
    t_lfr = int(np.ceil(t / n))
    left = (m - 1) // 2
    padded = np.concatenate([np.tile(feats[0], (left, 1)), feats])
    need = (t_lfr - 1) * n + m
    if need > len(padded):
        padded = np.concatenate([padded, np.tile(feats[-1], (need - len(padded), 1))])
    return np.stack([padded[i * n : i * n + m].reshape(-1) for i in range(t_lfr)])


def kaldi_fbank_np(audio, sr=16000, n_mels=80):
    win, hop, n_fft = 400, 160, 512
    nf = (len(audio) - win) // hop + 1
    frames = np.stack([audio[i * hop : i * hop + win] for i in range(nf)])
    frames = frames - frames.mean(axis=1, keepdims=True)
    frames = np.concatenate([frames[:, :1], frames[:, 1:] - 0.97 * frames[:, :-1]], axis=1)
    frames = frames * (hann_sym(win) ** 0.85)
    frames = np.pad(frames, ((0, 0), (0, n_fft - win)))
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2

    def hz2mel(h):
        return 2595 * np.log10(1 + h / 700)

    def mel2hz(m):
        return 700 * (10 ** (m / 2595) - 1)

    mel_pts = hz2mel(20) + np.arange(n_mels + 2) * (hz2mel(8000) - hz2mel(20)) / (n_mels + 1)
    bins = np.round(mel2hz(mel_pts) * n_fft / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        l, c, r = bins[m], bins[m + 1], bins[m + 2]
        for k in range(l, c):
            if 0 <= k <= n_fft // 2 and c != l:
                fb[m, k] = (k - l) / (c - l)
        for k in range(c, r):
            if 0 <= k <= n_fft // 2 and r != c:
                fb[m, k] = (r - k) / (r - c)
    mel = power @ fb.T
    return np.log(np.maximum(mel, 1.1920929e-07))


def s3gen_mel_np(audio, n_fft=1920, n_mels=80, sr=24000, hop=480):
    pad = (n_fft - hop) // 2
    audio = np.pad(audio, pad, mode="reflect")
    spec = stft_np(audio, hann_periodic(n_fft), n_fft, hop, center=False)
    mag = np.abs(spec)
    mel = mag @ mel_fb_slaney(sr, n_fft, n_mels, fmax=8000).T
    return np.log(np.maximum(mel, 1e-5)).T
