"""CLI surface tests (reference flag parity: /root/reference/indextts/cli.py:7-70,
plus the TPU additions --fast-latents/--quant-kv/--batch-file). The engine is
stubbed — engine behavior itself is covered by tests/test_engine*.py."""

import os

import numpy as np
import pytest

from indextts_tpu import cli


class StubTTS:
    instances = []

    def __init__(self, **kw):
        self.kw = kw
        self.calls = []
        StubTTS.instances.append(self)

    def infer(self, audio_prompt=None, text="", output_path=None, **kw):
        self.calls.append(("infer", audio_prompt, text, output_path))
        open(output_path, "wb").write(b"RIFF")
        return output_path

    def infer_fast(self, audio_prompt=None, text="", output_path=None, **kw):
        self.calls.append(("infer_fast", audio_prompt, text, output_path))
        open(output_path, "wb").write(b"RIFF")
        return output_path

    def infer_batch(self, items, output_paths=None, **kw):
        self.calls.append(("infer_batch", list(items), list(output_paths)))
        for p in output_paths:
            open(p, "wb").write(b"RIFF")
        return output_paths


@pytest.fixture()
def stub(monkeypatch, tmp_path):
    import indextts_tpu.engine as eng

    StubTTS.instances = []
    monkeypatch.setattr(eng, "IndexTTS", StubTTS)
    cfg = tmp_path / "config.yaml"
    cfg.write_text("{}")
    voice = tmp_path / "v.wav"
    voice.write_bytes(b"RIFF")
    return tmp_path, str(cfg), str(voice)


class TestCLI:
    def test_single_mode(self, stub):
        tmp, cfg, voice = stub
        out = str(tmp / "o.wav")
        cli.main(["hello.", "-v", voice, "-c", cfg, "--model_dir", str(tmp), "-o", out])
        eng = StubTTS.instances[-1]
        assert eng.calls == [("infer", voice, "hello.", out)]

    def test_fast_and_flags(self, stub):
        tmp, cfg, voice = stub
        out = str(tmp / "o2.wav")
        cli.main(["hi.", "-v", voice, "-c", cfg, "--model_dir", str(tmp), "-o", out,
                  "--fast", "--fast-latents", "--quant-kv"])
        eng = StubTTS.instances[-1]
        assert eng.calls[0][0] == "infer_fast"
        assert eng.kw["fast_latents"] is True and eng.kw["quant_kv"] is True

    def test_no_fp16_flag(self, stub):
        """--no-fp16 requests fp32 (the store_true+default=True form made
        --fp16 a no-op with no way to get the promised fp32)."""
        tmp, cfg, voice = stub
        cli.main(["a.", "-v", voice, "-c", cfg, "--model_dir", str(tmp),
                  "-o", str(tmp / "f.wav"), "--no-fp16"])
        assert StubTTS.instances[-1].kw["is_fp16"] is False
        cli.main(["a.", "-v", voice, "-c", cfg, "--model_dir", str(tmp),
                  "-o", str(tmp / "f2.wav")])
        assert StubTTS.instances[-1].kw["is_fp16"] is True

    def test_force_does_not_predelete(self, stub, monkeypatch):
        """--force must not destroy the previous output before the engine
        even loads — a failed run would lose the old audio for nothing."""
        tmp, cfg, voice = stub
        out = str(tmp / "keep.wav")
        open(out, "wb").write(b"OLD")

        class BoomTTS(StubTTS):
            def __init__(self, **kw):
                raise RuntimeError("synthetic init failure")

        import indextts_tpu.engine as eng

        monkeypatch.setattr(eng, "IndexTTS", BoomTTS)
        with pytest.raises(RuntimeError):
            cli.main(["x.", "-v", voice, "-c", cfg, "--model_dir", str(tmp),
                      "-o", out, "-f"])
        assert open(out, "rb").read() == b"OLD"

    def test_batch_file_crlf(self, stub, tmp_path):
        """CRLF TSVs (Windows-authored batch files) must not leave \\r stuck
        to voice paths or text."""
        tmp, cfg, voice = stub
        bf = tmp_path / "b.tsv"
        bf.write_bytes(f"{voice}\thello one.\r\nhello two.\r\n".encode())
        outdir = str(tmp_path / "outs")
        cli.main(["-c", cfg, "--model_dir", str(tmp), "-v", voice,
                  "--batch-file", str(bf), "-o", outdir])
        eng = StubTTS.instances[-1]
        items = eng.calls[-1][1]
        assert items[0][1] == "hello one." and items[1][1] == "hello two."

    def test_batch_file(self, stub, tmp_path):
        tmp, cfg, voice = stub
        voice2 = tmp / "w.wav"
        voice2.write_bytes(b"RIFF")
        bf = tmp / "jobs.tsv"
        bf.write_text(f"first line.\n{voice2}\tsecond line.\n\n", encoding="utf-8")
        outdir = str(tmp / "outs")
        cli.main(["--batch-file", str(bf), "-v", voice, "-c", cfg,
                  "--model_dir", str(tmp), "-o", outdir])
        eng = StubTTS.instances[-1]
        kind, items, paths = eng.calls[0]
        assert kind == "infer_batch"
        assert items == [(voice, "first line."), (str(voice2), "second line.")]
        assert [os.path.basename(p) for p in paths] == ["000.wav", "001.wav"]
        assert all(os.path.exists(p) for p in paths)

    def test_batch_file_missing_voice_errors(self, stub):
        tmp, cfg, voice = stub
        bf = tmp / "jobs.tsv"
        bf.write_text("no voice here.\n", encoding="utf-8")
        with pytest.raises(SystemExit):
            cli.main(["--batch-file", str(bf), "-c", cfg, "--model_dir", str(tmp),
                      "-o", str(tmp / "outs")])

    def test_empty_text_errors(self, stub):
        tmp, cfg, voice = stub
        with pytest.raises(SystemExit):
            cli.main(["   ", "-v", voice, "-c", cfg, "--model_dir", str(tmp)])

    def test_batch_file_tab_in_text(self, stub):
        """Only the FIRST tab separates voice from text; later tabs are text."""
        tmp, cfg, voice = stub
        bf = tmp / "jobs2.tsv"
        bf.write_text(f"{voice}\twith\ta tab.\n", encoding="utf-8")
        cli.main(["--batch-file", str(bf), "-c", cfg, "--model_dir", str(tmp),
                  "-o", str(tmp / "outs2")])
        _, items, _ = StubTTS.instances[-1].calls[0]
        assert items == [(voice, "with\ta tab.")]
