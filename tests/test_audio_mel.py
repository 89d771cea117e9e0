"""Audio I/O and mel frontend tests. STFT numerics are validated against
torch.stft (torch CPU is available in the image as a test oracle only — the
framework itself never imports torch outside checkpoint conversion)."""

import os

import numpy as np
import pytest

from indextts_tpu.utils.audio import load_audio, read_wav, resample, write_wav
from indextts_tpu.utils.mel import (
    MelSpectrogramFeatures,
    hann_window,
    mel_filterbank,
    stft_magnitude,
)


class TestWav:
    def test_write_read_round_trip(self, tmp_path):
        sr = 24000
        t = np.linspace(0, 1, sr, endpoint=False)
        audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "a.wav")
        write_wav(path, (audio * 32767)[None, :], sr)
        back, sr2 = read_wav(path)
        assert sr2 == sr
        assert back.shape == (1, sr)
        assert np.abs(back[0] - audio).max() < 1e-3

    def test_write_wav_sanitizes_non_finite(self, tmp_path):
        """NaN/inf samples degrade to silence/clipped PCM, never to the
        undefined NaN->int16 cast (RuntimeWarning + garbage audio)."""
        import warnings

        sr = 24000
        audio = np.zeros((1, 100), np.float32)
        audio[0, 10] = np.nan
        audio[0, 20] = np.inf
        audio[0, 30] = -np.inf
        path = str(tmp_path / "n.wav")
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any cast warning fails the test
            write_wav(path, audio, sr)
        back, _ = read_wav(path)  # normalized floats
        assert back[0, 10] == 0
        assert back[0, 20] > 0.99
        assert back[0, 30] < -0.99

    def test_load_audio_resamples(self, tmp_path):
        sr = 48000
        audio = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.1
        path = str(tmp_path / "b.wav")
        write_wav(path, (audio * 32767)[None, :], sr)
        out = load_audio(path, 24000)
        assert out.shape[0] == 1
        assert abs(out.shape[1] - 24000) <= 1
        assert np.abs(out).max() <= 1.0

    def test_reference_fixture_loads(self):
        ref = "/root/reference/tests/sample_prompt.wav"
        if not os.path.exists(ref):
            pytest.skip("reference fixture unavailable")
        audio, sr = read_wav(ref)
        assert audio.ndim == 2 and audio.shape[1] > 1000


class TestSTFT:
    def test_matches_torch_stft(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal(24000).astype(np.float32)
        mine = stft_magnitude(x, 1024, 256, 1024, center=True, power=1.0)
        gold = (
            torch.stft(
                torch.from_numpy(x),
                n_fft=1024,
                hop_length=256,
                win_length=1024,
                window=torch.hann_window(1024),
                center=True,
                pad_mode="reflect",
                return_complex=True,
                onesided=True,
            )
            .abs()
            .numpy()
        )
        assert mine.shape == gold.shape
        assert np.abs(mine - gold).max() < 1e-4

    def test_hann_window_periodic(self):
        torch = pytest.importorskip("torch")
        assert np.abs(hann_window(1024) - torch.hann_window(1024).numpy()).max() < 1e-6

    def test_frame_count(self):
        # torch.stft center=True: frames = 1 + T // hop
        x = np.zeros(24000, dtype=np.float32)
        out = stft_magnitude(x, 1024, 256)
        assert out.shape == (513, 1 + 24000 // 256)


class TestMel:
    def test_shapes_and_log_floor(self):
        mel = MelSpectrogramFeatures()
        x = np.zeros((1, 24000), dtype=np.float32)
        out = mel(x)
        assert out.shape == (1, 100, 1 + 24000 // 256)
        assert np.allclose(out, np.log(1e-7))  # silence hits the safe_log clip

    def test_chunked_stft_matches_unchunked(self, monkeypatch):
        """Frame chunking (the long-upload OOM guard) is bit-identical to a
        single-chunk pass — same float64 math, just bounded transients."""
        from indextts_tpu.utils import mel as mel_mod

        x = np.random.default_rng(3).standard_normal((1, 24000)).astype(np.float32)
        ref = MelSpectrogramFeatures()(x)  # 94 frames: single chunk
        monkeypatch.setattr(mel_mod, "_STFT_FRAME_CHUNK", 7)  # force many chunks
        np.testing.assert_array_equal(MelSpectrogramFeatures()(x), ref)

    def test_unbatched_input_unbatched_output(self):
        """[T] in -> [n_mels, frames] out, per the documented [..., T]
        contract (previously returned a spurious [1, n_mels, frames])."""
        mel = MelSpectrogramFeatures()
        x1 = np.zeros(24000, dtype=np.float32)
        out1 = mel(x1)
        assert out1.shape == (100, 1 + 24000 // 256)
        np.testing.assert_array_equal(out1, mel(x1[None])[0])

    def test_filterbank_properties(self):
        fb = mel_filterbank(513, 0.0, 12000.0, 100, 24000, None)
        assert fb.shape == (513, 100)
        assert (fb >= 0).all()
        # every filter has support
        assert (fb.sum(axis=0) > 0).all()
        # htk norm=None peaks are 1-ish triangles
        assert fb.max() <= 1.0 + 1e-6

    def test_mel_frames_per_code(self):
        # mel_length_compression=1024 wav samples per code = 4 frames per code
        # (reference: model.py:301, models.py feat_upsample 4x)
        mel = MelSpectrogramFeatures()
        x = np.zeros((1, 1024 * 8), dtype=np.float32)
        out = mel(x)
        assert out.shape[-1] == 1 + (1024 * 8) // 256
