"""Console CLI: `indextts-tpu "text" --voice prompt.wav -o out.wav`.

Same flag surface as the reference CLI (indextts/cli.py:7-70) — text, -v/--voice,
-o/--output_path, -c/--config, --model_dir, --fp16, -f/--force, -d/--device —
with the device cascade replaced by JAX platform selection, and the engine API
coherent again (the reference CLI calls tts.infer(audio_prompt=...) against an
engine that only takes prompt_mel, cli.py:70 vs infer.py:101; this engine
accepts both).
"""

import argparse
import os
import sys
import warnings

warnings.filterwarnings("ignore", category=UserWarning)
warnings.filterwarnings("ignore", category=FutureWarning)


def main(argv=None):
    parser = argparse.ArgumentParser(description="IndexTTS (TPU) Command Line")
    parser.add_argument("text", type=str, nargs="?", default="", help="Text to be synthesized")
    parser.add_argument("-v", "--voice", type=str, default=None, help="Path to the audio prompt file (wav format)")
    parser.add_argument(
        "-o", "--output_path", type=str, default=None,
        help="Path to the output wav file (default gen.wav; with --batch-file: "
        "the output directory, default gen_batch)",
    )
    parser.add_argument(
        "-c", "--config", type=str, default="checkpoints/config.yaml",
        help="Path to the config file. Default is 'checkpoints/config.yaml'",
    )
    parser.add_argument("--model_dir", type=str, default="checkpoints", help="Path to the model directory.")
    # BooleanOptionalAction: the reference's store_true + default=True makes
    # --fp16 a no-op with no way to request fp32; --no-fp16 delivers the
    # "(fp32 otherwise)" the help promises (e.g. for debugging bf16 numerics)
    parser.add_argument("--fp16", action=argparse.BooleanOptionalAction, default=True,
                        help="Use bf16 compute on TPU (--no-fp16 for fp32)")
    parser.add_argument("-f", "--force", action="store_true", default=False, help="Overwrite the output file if it exists")
    parser.add_argument(
        "-d", "--device", type=str, default=None,
        help="Ignored: JAX selects the platform (tpu > cpu). Kept for reference-CLI compatibility.",
    )
    parser.add_argument("--fast", action="store_true", default=False, help="Use bucketed batch inference (infer_fast)")
    parser.add_argument(
        "--fast-latents", action="store_true", default=False,
        help="Capture vocoder latents during decode (skips the teacher-forced "
        "pass when silence removal changes nothing; consistent-positions mode)",
    )
    parser.add_argument(
        "--quant-kv", action="store_true", default=False,
        help="Int8-quantized KV cache for the AR decode (lower HBM traffic; "
        "near-parity outputs)",
    )
    parser.add_argument(
        "--compile-cache", type=str, default=None, metavar="DIR",
        help="Persistent XLA compile cache directory (also env "
        "INDEXTTS_COMPILE_CACHE): compiled graphs reload in seconds on "
        "later runs instead of recompiling for minutes",
    )
    parser.add_argument(
        "--tp", type=int, default=None,
        help="Tensor-parallel degree over the TPU mesh (default: all visible "
        "chips on the model axis when more than one is present; ignored "
        "single-chip)",
    )
    parser.add_argument(
        "--batch-file", type=str, default=None,
        help="TSV of synthesis jobs, one per line: 'text' (uses -v voice) or "
        "'voice_path<TAB>text'. All jobs run as ONE continuous batch "
        "(engine.infer_batch — cross-request decode batches); -o names the "
        "output DIRECTORY (default gen_batch/).",
    )
    args = parser.parse_args(argv)
    if args.batch_file:
        if not os.path.exists(args.batch_file):
            print(f"Batch file {args.batch_file} does not exist.")
            sys.exit(1)
    else:
        if len(args.text.strip()) == 0:
            print("ERROR: Text is empty.")
            parser.print_help()
            sys.exit(1)
        if args.voice is None or not os.path.exists(args.voice):
            print(f"Audio prompt file {args.voice} does not exist.")
            parser.print_help()
            sys.exit(1)
    if not os.path.exists(args.config):
        print(f"Config file {args.config} does not exist.")
        parser.print_help()
        sys.exit(1)

    output_path = args.output_path or ("gen_batch" if args.batch_file else "gen.wav")
    if not args.batch_file and os.path.exists(output_path) and not args.force:
        print(f"ERROR: Output file {output_path} already exists. Use --force to overwrite.")
        parser.print_help()
        sys.exit(1)
    # no pre-delete under --force: a failure during model load/generation
    # must not have already destroyed the previous result (the engine
    # removes the old file right before writing the new one)

    import jax

    if jax.devices()[0].platform == "cpu":
        print("WARNING: Running on CPU may be slow.")

    from indextts_tpu.engine import IndexTTS

    tts = IndexTTS(
        cfg_path=args.config, model_dir=args.model_dir, is_fp16=args.fp16,
        device=args.device, fast_latents=args.fast_latents, quant_kv=args.quant_kv,
        tp=args.tp, compile_cache_dir=args.compile_cache,
    )
    if args.batch_file:
        items = []
        with open(args.batch_file, encoding="utf-8") as f:
            for ln, line in enumerate(f, 1):
                line = line.rstrip("\r\n")  # CRLF TSVs: \r must not stick to paths/text
                if not line.strip():
                    continue
                # first tab separates voice from text; later tabs stay in text
                voice, sep, text = line.partition("\t")
                if not sep:
                    voice, text = "", line
                voice = voice or args.voice
                if not voice or not os.path.exists(voice):
                    print(f"ERROR: {args.batch_file}:{ln}: no voice file "
                          f"({voice!r}) — give 'voice<TAB>text' or -v.")
                    sys.exit(1)
                if not text.strip():
                    print(f"ERROR: {args.batch_file}:{ln}: empty text.")
                    sys.exit(1)
                items.append((voice, text.strip()))
        if not items:
            print(f"ERROR: {args.batch_file} has no jobs.")
            sys.exit(1)
        outdir = output_path
        os.makedirs(outdir, exist_ok=True)
        paths = [os.path.join(outdir, f"{i:03d}.wav") for i in range(len(items))]
        for p in paths:
            if os.path.exists(p) and not args.force:
                print(f"ERROR: Output file {p} already exists. Use --force to overwrite.")
                sys.exit(1)
        tts.infer_batch(items, output_paths=paths)
        return
    infer = tts.infer_fast if args.fast else tts.infer
    infer(audio_prompt=args.voice, text=args.text.strip(), output_path=output_path)


if __name__ == "__main__":
    main()
