"""Command-line interface.

Preserves the reference CLI contracts:
  * `transcribe <model name> <audio file> <lang> <transcription file>`
    (whisper-burn src/bin/transcribe/main.rs:85-94): loads `<model>.cfg` +
    weights + `tokenizer.json`, asserts 16 kHz mono (main.rs:41-42) unless
    `--resample`, writes the transcription file (main.rs:153).
  * `convert <dump dir>` (src/bin/convert/main.rs:23-57): converts a npy dump
    tree into the fast-load format + `<dir>.cfg`. The reference emits Burn
    `.mpk.gz`; the TPU-native fast format is `.safetensors`.

Extra (new capability) flags are opt-in and default to reference behavior.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first-run compiles through the TPU
    tunnel are slow (minutes); cached reloads are instant."""
    import jax

    cache_dir = os.environ.get(
        "WHISPER_TPU_CACHE", os.path.expanduser("~/.cache/whisper_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cmd_transcribe(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu transcribe",
        description="Transcribe a WAV file (reference CLI parity).",
    )
    p.add_argument("model", help="model name: <name>.cfg + <name>.safetensors/"
                                 ".mpk.gz, or a npy dump directory")
    p.add_argument("audio", help="16 kHz mono WAV file")
    p.add_argument("lang", help="language code, e.g. en, or 'auto' to "
                                "detect the spoken language from the first "
                                "window (multilingual models)")
    p.add_argument("out", help="output transcription text file")
    p.add_argument("--tokenizer", default=None,
                   help="path to tokenizer.json (default: next to model, then CWD)")
    p.add_argument("--greedy", action="store_true",
                   help="greedy decoding instead of beam search")
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--max-depth", type=int, default=100)
    p.add_argument("--resample", action="store_true",
                   help="resample input to 16 kHz instead of rejecting it")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--parallel-windows", action="store_true",
                   help="decode all ~15s windows of the file as one batch "
                        "(identical output: windows are independent, the "
                        "reference discards cross-window context; several "
                        "times faster on long audio)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 cross-KV cache (faster decode, tiny accuracy cost)")
    p.add_argument("--task", choices=["transcribe", "translate"],
                   default="transcribe",
                   help="translate: X->English translation (multilingual "
                        "models; uses the <|translate|> task token)")
    p.add_argument("--self-quant", action="store_true",
                   help="int8 self-KV cache with per-row scales (fastest "
                        "beam decode; gated by `whisper_tpu quant-check`)")
    p.add_argument("--temperature", default="0",
                   help="decode temperature; a comma list (e.g. "
                        "'0,0.2,0.4,0.6,0.8,1.0') enables the quality "
                        "fallback ladder (compression-ratio + logprob "
                        "checks; sampling at temps > 0)")
    p.add_argument("--no-speech-threshold", type=float, default=None,
                   help="skip windows whose p(<|nospeech|>) exceeds this "
                        "and whose logprob check failed")
    p.add_argument("--vad", action="store_true",
                   help="energy VAD pre-filter: skip windows with < 100 ms "
                        "of audio above the threshold before any device "
                        "work (silence costs ~0 chip time)")
    p.add_argument("--vad-threshold-db", type=float, default=-40.0,
                   help="VAD energy threshold in dBFS (default -40; raise "
                        "toward 0 to skip more aggressively)")
    p.add_argument("--timestamps", action="store_true",
                   help="write '[start -> end] text' segment lines instead "
                        "of plain text (timestamped decoding)")
    p.add_argument("--words", action="store_true",
                   help="with --timestamps: append per-word timings "
                        "(cross-attention DTW alignment) as "
                        "'  word [start -> end]' lines")
    p.add_argument("--json", action="store_true",
                   help="with --timestamps: write a JSON document "
                        "{text, segments: [{start, end, text, words?}]} "
                        "instead of plain lines (alias for --format json)")
    p.add_argument("--format", choices=["txt", "json", "srt", "vtt", "tsv"],
                   default=None, dest="out_format",
                   help="output format; srt/vtt/tsv/json require "
                        "--timestamps (vtt + --words emits per-word "
                        "highlight cues)")
    p.add_argument("--condition-on-previous-text", action="store_true",
                   help="feed each window the previously decoded text as "
                        "<|startofprev|> context (OpenAI's long-form "
                        "default; the reference discards it as a "
                        "hallucination workaround, so parity keeps it off)")
    p.add_argument("--clip", default=None, metavar="S0,E0[,S1,E1...]",
                   help="transcribe only these time ranges (seconds); an "
                        "odd count leaves the last clip open-ended")
    p.add_argument("--initial-prompt", default=None,
                   help="condition the decoder on this text (domain terms, "
                        "names, style) via <|startofprev|>; applied to every "
                        "window, stripped from the output")
    p.add_argument("--draft", default=None, metavar="MODEL",
                   help="speculative decoding (with --greedy): a smaller "
                        "model sharing the tokenizer (e.g. multilingual "
                        "tiny for large-v2) drafts tokens, the main model "
                        "verifies them in one step -- identical output, "
                        "fewer large-model steps on the B=1 latency path")
    p.add_argument("--draft-k", type=int, default=4,
                   help="speculative block size: 1 committed + k-1 drafted "
                        "tokens per verify step (default 4)")
    p.add_argument("-v", "--verbose", action="count", default=0)
    args = p.parse_args(argv)

    from .utils.logging import configure

    configure(args.verbose)
    _enable_compilation_cache()

    import jax.numpy as jnp

    from .config import SAMPLE_RATE, WhisperConfig
    from .io import checkpoint, native as wav_native, wav
    from .pipeline.transcribe import DecodeOptions, Transcriber
    from .text.tokenizer import LANGUAGES_V3, WhisperTokenizer

    print("Loading waveform...")  # main.rs:109 contract
    try:
        # C++ fast path (WAV + FLAC), pure-Python WAV fallback
        waveform, rate = wav_native.load_audio(args.audio)
    except Exception as e:
        print(f"Failed to load audio file: {e}", file=sys.stderr)
        return 1
    if rate != SAMPLE_RATE:
        if args.resample:
            waveform = wav.resample(waveform, rate, SAMPLE_RATE)
            rate = SAMPLE_RATE
        else:
            print(
                f"The audio sample rate must be 16k (got {rate}); "
                "pass --resample to convert.",
                file=sys.stderr,
            )
            return 1

    tok_path = args.tokenizer
    if tok_path is None:
        model_dir = os.path.dirname(os.path.abspath(args.model))
        for cand in (os.path.join(model_dir, "tokenizer.json"), "tokenizer.json"):
            if os.path.exists(cand):
                tok_path = cand
                break
        else:
            print("Failed to load tokenizer: tokenizer.json not found",
                  file=sys.stderr)
            return 1
    try:
        tokenizer = WhisperTokenizer(tok_path)
    except Exception as e:
        print(f"Failed to load tokenizer: {e}", file=sys.stderr)
        return 1

    cfg = None
    cfg_path = f"{args.model}.cfg"
    if os.path.exists(cfg_path):
        cfg = WhisperConfig.load(cfg_path)

    print("Loading model...")  # main.rs:134 contract
    try:
        params, cfg = checkpoint.load_params(args.model, cfg)
    except Exception as e:
        print(f"Failed to load whisper model file: {e}", file=sys.stderr)
        return 1

    draft = None
    if args.draft is not None:
        if not args.greedy:
            print("--draft requires --greedy (speculative decoding is "
                  "exact only at temperature-0 greedy)", file=sys.stderr)
            return 1
        if args.parallel_windows:
            print("--draft is incompatible with --parallel-windows "
                  "(speculative decoding is the B=1 latency path)",
                  file=sys.stderr)
            return 1
        d_cfg = None
        d_cfg_path = f"{args.draft}.cfg"
        if os.path.exists(d_cfg_path):
            d_cfg = WhisperConfig.load(d_cfg_path)
        try:
            draft = checkpoint.load_params(args.draft, d_cfg)
        except Exception as e:
            print(f"Failed to load draft model file: {e}", file=sys.stderr)
            return 1

    # Full 99-language table (incl. haw, which the reference's table omits,
    # src/token.rs:50-58); whether the code resolves against THIS tokenizer
    # is checked by language_token at prompt construction. "auto" detects
    # from audio (new capability; the reference requires the language,
    # src/bin/transcribe/main.rs:97-105).
    if args.lang != "auto" and args.lang not in LANGUAGES_V3:  # union table: haw + yue resolve iff the tokenizer carries them
        print(f"Invalid language abbreviation: {args.lang}", file=sys.stderr)
        return 1

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    if args.lang == "auto":
        t = Transcriber(params, cfg, tokenizer, dtype=dtype)
        try:
            code, dist = t.detect_language(waveform, rate)
        except ValueError as e:
            print(f"Language detection failed: {e}", file=sys.stderr)
            return 1
        print(f"Detected language: {code} (p={dist[code]:.2f})")
        args.lang = code
    opts = DecodeOptions(
        lang=args.lang,
        task=args.task,
        strategy="greedy" if args.greedy else "beam",
        beam_size=args.beam_size,
        max_depth=args.max_depth,
        kv_quant=args.kv_quant,
        self_quant=args.self_quant,
        initial_prompt=args.initial_prompt,
        condition_on_previous_text=args.condition_on_previous_text,
        temperature=(
            tuple(float(x) for x in args.temperature.split(","))
            if "," in args.temperature else float(args.temperature)
        ),
        no_speech_threshold=args.no_speech_threshold,
        clip_timestamps=args.clip,
        vad=args.vad,
        vad_threshold_db=args.vad_threshold_db,
    )
    if args.clip:
        from .pipeline.transcribe import parse_clip_timestamps

        try:
            parse_clip_timestamps(args.clip, len(waveform) / rate)
        except ValueError as e:
            print(f"Bad --clip: {e}", file=sys.stderr)
            return 1
    t0 = time.perf_counter()
    if args.clip and args.parallel_windows:
        print("--clip is incompatible with --parallel-windows",
              file=sys.stderr)
        return 1
    if args.condition_on_previous_text and args.parallel_windows:
        print("--condition-on-previous-text is incompatible with "
              "--parallel-windows (windows must decode sequentially)",
              file=sys.stderr)
        return 1
    out_format = args.out_format or ("json" if args.json else "txt")
    if out_format != "txt" and not args.timestamps:
        print(f"--format {out_format} requires --timestamps", file=sys.stderr)
        return 1
    out_lines = None
    if args.timestamps:
        if args.parallel_windows:
            print("--timestamps is incompatible with --parallel-windows",
                  file=sys.stderr)
            return 1
        t = Transcriber(params, cfg, tokenizer, dtype=dtype,
                        draft=draft, draft_k=args.draft_k)
        text, segments = t.transcribe_with_timestamps(
            waveform, rate, opts, word_timestamps=args.words)
        if out_format == "json":
            import json as _json

            def seg_doc(seg):
                d = {"start": round(seg.start, 3),
                     "end": round(seg.end, 3), "text": seg.text}
                # decode-quality metadata (filter low-confidence segments)
                if seg.avg_logprob is not None:
                    d["avg_logprob"] = round(seg.avg_logprob, 4)
                if seg.compression_ratio is not None:
                    d["compression_ratio"] = round(seg.compression_ratio, 4)
                if seg.no_speech_prob is not None:
                    d["no_speech_prob"] = round(seg.no_speech_prob, 4)
                if seg.words is not None:
                    d["words"] = [
                        {"word": w.word, "start": round(w.start, 3),
                         "end": round(w.end, 3)} for w in seg.words]
                return d

            doc = {"text": text, "segments": [seg_doc(s) for s in segments]}
            out_lines = [_json.dumps(doc, ensure_ascii=False, indent=1)]
        elif out_format in ("srt", "vtt", "tsv"):
            from .pipeline import formats

            if out_format == "srt":
                out_lines = [formats.to_srt(segments)]
            elif out_format == "vtt":
                out_lines = [formats.to_vtt(
                    segments, highlight_words=args.words)]
            else:
                out_lines = [formats.to_tsv(segments)]
        else:
            out_lines = []
            for seg in segments:
                out_lines.append(
                    f"[{seg.start:.2f} -> {seg.end:.2f}] {seg.text}")
                for w in seg.words or ():
                    out_lines.append(
                        f"  {w.word} [{w.start:.2f} -> {w.end:.2f}]")
    elif args.parallel_windows:
        from .pipeline.batch import BatchTranscriber

        bt = BatchTranscriber(params, cfg, tokenizer, dtype=dtype)
        (text, _tokens), = bt.transcribe_many([waveform], rate, opts)
    else:
        t = Transcriber(params, cfg, tokenizer, dtype=dtype,
                        draft=draft, draft_k=args.draft_k)
        text, _tokens = t.transcribe(waveform, rate, opts)
    dt = time.perf_counter() - t0

    with open(args.out, "w") as f:
        f.write("\n".join(out_lines) if out_lines is not None else text)
    if args.verbose:
        audio_sec = len(waveform) / rate
        print(f"[{audio_sec:.1f}s audio in {dt:.1f}s = {audio_sec/dt:.1f}x RT]",
              file=sys.stderr)
    print("Transcription finished.")  # main.rs:159 contract
    return 0


def cmd_convert(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu convert",
        description="Convert a npy dump tree to the fast-load format "
                    "(reference convert CLI parity).",
    )
    p.add_argument("dump_dir", help="npy dump directory (python/dump.py output)")
    p.add_argument("--out", default=None,
                   help="output basename (default: <dump_dir>)")
    p.add_argument("--mpk", action="store_true",
                   help="also write the reference's Burn <name>.mpk.gz "
                        "record (convert main.rs:17-19 output)")
    args = p.parse_args(argv)

    from .io import checkpoint, npy_tree

    name = args.out or args.dump_dir.rstrip("/")
    try:
        params, cfg = npy_tree.load_whisper(args.dump_dir)
    except Exception as e:
        print(f"Error loading model {args.dump_dir}: {e}", file=sys.stderr)
        return 1
    print("Saving model...")  # convert main.rs:44 contract
    checkpoint.save_safetensors(params, cfg, f"{name}.safetensors")
    if args.mpk:
        from .io import mpk

        mpk.save_whisper_record(params, cfg, f"{name}.mpk.gz")
    print("Saving config...")  # convert main.rs:50 contract
    cfg.save(f"{name}.cfg")
    print("Finished.")  # convert main.rs:56 contract
    return 0


def cmd_convert_pt(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu convert-pt",
        description="Convert an OpenAI or HuggingFace Whisper .pt/.bin "
                    "checkpoint (replaces the reference's python/dump.py + "
                    "convert_huggingface_model.py).",
    )
    p.add_argument("pt_file", help="OpenAI {dims, model_state_dict} .pt or "
                                   "HF pytorch_model.bin")
    p.add_argument("out", help="output basename: writes <out>.safetensors + <out>.cfg")
    p.add_argument("--dump-tree", action="store_true",
                   help="also write the reference-format npy dump tree at <out>/")
    p.add_argument("--alignment-heads", default=None, metavar="JSON",
                   help="word-timing alignment heads as JSON [[layer, head],"
                        " ...] or a path to a JSON file (e.g. an HF "
                        "generation_config.json); auto-detected from a "
                        "sibling generation_config.json when omitted. "
                        "OpenAI .pt files do not embed the mask -- pass it "
                        "here for best word timestamps.")
    args = p.parse_args(argv)

    from .io import checkpoint, convert_pt, npy_tree

    heads = None
    if args.alignment_heads:
        import json as _json

        try:
            if os.path.exists(args.alignment_heads):
                with open(args.alignment_heads) as f:
                    heads = _json.load(f)
                if isinstance(heads, dict):  # a generation_config.json
                    heads = heads.get("alignment_heads")
                    if heads is None:
                        print(f"{args.alignment_heads}: no alignment_heads "
                              "key", file=sys.stderr)
                        return 1
            else:
                heads = _json.loads(args.alignment_heads)
        except ValueError as e:
            print(f"Bad --alignment-heads: {e}", file=sys.stderr)
            return 1
    try:
        params, cfg = convert_pt.load_pt(args.pt_file, alignment_heads=heads)
    except Exception as e:
        print(f"Error loading checkpoint {args.pt_file}: {e}", file=sys.stderr)
        return 1
    if cfg.alignment_heads:
        print(f"Alignment heads: {len(cfg.alignment_heads)} baked "
              "(word timings will use them)")
    print("Saving model...")
    checkpoint.save_safetensors(params, cfg, f"{args.out}.safetensors")
    print("Saving config...")
    cfg.save(f"{args.out}.cfg")
    if args.dump_tree:
        print("Saving npy dump tree...")
        npy_tree.save_whisper(params, cfg, args.out)
    print("Finished.")
    return 0


def cmd_transcribe_many(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu transcribe-many",
        description="Batched multi-stream transcription: N WAVs through one "
                    "chip concurrently (new capability beyond the reference).",
    )
    p.add_argument("model")
    p.add_argument("lang")
    p.add_argument("out_dir", help="one <stem>.txt per input is written here")
    p.add_argument("wavs", nargs="+", help="16 kHz mono WAV files")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--resample", action="store_true")
    p.add_argument("--vad", action="store_true",
                   help="energy VAD pre-filter: silent windows never reach "
                        "the batch queue (see `transcribe --vad`)")
    p.add_argument("--vad-threshold-db", type=float, default=-40.0,
                   help="VAD silence threshold in dBFS (with --vad)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("-v", "--verbose", action="count", default=0)
    args = p.parse_args(argv)

    from .utils.logging import configure

    configure(args.verbose)
    _enable_compilation_cache()

    import jax.numpy as jnp

    from .config import SAMPLE_RATE
    from .io import checkpoint, native as wav_native, wav
    from .pipeline.batch import BatchTranscriber
    from .pipeline.transcribe import DecodeOptions
    from .text.tokenizer import WhisperTokenizer

    tok_path = args.tokenizer or os.path.join(
        os.path.dirname(os.path.abspath(args.model)), "tokenizer.json"
    )
    tokenizer = WhisperTokenizer(tok_path)
    params, cfg = checkpoint.load_params(args.model)
    bt = BatchTranscriber(
        params, cfg, tokenizer, batch_size=args.batch_size,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
    )

    waves = []
    for path in args.wavs:
        w, rate = wav_native.load_audio(path)
        if rate != SAMPLE_RATE:
            if not args.resample:
                print(f"{path}: sample rate must be 16k (got {rate}); "
                      "pass --resample.", file=sys.stderr)
                return 1
            w = wav.resample(w, rate, SAMPLE_RATE)
        waves.append(w)

    t0 = time.perf_counter()
    results = bt.transcribe_many(
        waves, SAMPLE_RATE,
        DecodeOptions(lang=args.lang,
                      strategy="greedy" if args.greedy else "beam",
                      beam_size=args.beam_size, vad=args.vad,
                      vad_threshold_db=args.vad_threshold_db),
    )
    dt = time.perf_counter() - t0

    os.makedirs(args.out_dir, exist_ok=True)
    for path, (text, _toks) in zip(args.wavs, results):
        stem = os.path.splitext(os.path.basename(path))[0]
        with open(os.path.join(args.out_dir, stem + ".txt"), "w") as f:
            f.write(text)
    audio_sec = sum(len(w) for w in waves) / SAMPLE_RATE
    print(f"Transcribed {len(waves)} files ({audio_sec:.0f}s audio) "
          f"in {dt:.1f}s ({audio_sec/dt:.1f}x RT).")
    return 0


def cmd_eval(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu eval",
        description="WER evaluation over a local dataset (LibriSpeech layout "
                    "or manifest file).",
    )
    p.add_argument("model")
    p.add_argument("dataset", help="LibriSpeech-style directory, or a "
                                   ".tsv/.jsonl manifest (audio<TAB>text)")
    p.add_argument("lang", nargs="?", default="en")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--basic-normalizer", action="store_true",
                   help="language-agnostic normalization instead of the "
                        "OpenAI-style English rules")
    p.add_argument("-v", "--verbose", action="count", default=0)
    args = p.parse_args(argv)

    from .utils.logging import configure

    configure(args.verbose)
    _enable_compilation_cache()

    import jax.numpy as jnp

    from .eval import wer as werlib
    from .io import checkpoint, native as wav_native, wav
    from .pipeline.transcribe import DecodeOptions, Transcriber
    from .text.tokenizer import WhisperTokenizer
    from .config import SAMPLE_RATE

    tok_path = args.tokenizer or os.path.join(
        os.path.dirname(os.path.abspath(args.model)), "tokenizer.json"
    )
    tokenizer = WhisperTokenizer(tok_path)
    params, cfg = checkpoint.load_params(args.model)
    t = Transcriber(params, cfg, tokenizer,
                    dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
    opts = DecodeOptions(lang=args.lang,
                         strategy="greedy" if args.greedy else "beam")

    def transcribe_path(path: str) -> str:
        waveform, rate = wav_native.load_audio(path)  # WAV or FLAC
        if rate != SAMPLE_RATE:
            waveform = wav.resample(waveform, rate, SAMPLE_RATE)
        text, _ = t.transcribe(waveform, SAMPLE_RATE, opts,
                               on_chunk=lambda *a: None)
        return text

    if os.path.isdir(args.dataset):
        items = werlib.iter_librispeech(args.dataset)
    else:
        items = werlib.iter_manifest(args.dataset)

    def progress(i, audio, ref, hyp, res):
        print(f"[{i}] WER so far: {res.wer:.4f} ({res.errors}/{res.words})",
              file=sys.stderr)

    result = werlib.evaluate(transcribe_path, items, limit=args.limit,
                             on_item=progress if args.verbose else None,
                             english=not args.basic_normalizer)
    import json as _json

    print(_json.dumps({
        "wer": round(result.wer, 5),
        "errors": result.errors,
        "words": result.words,
        "utterances": result.utterances,
    }))
    return 0


def cmd_quant_check(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu quant-check",
        description="Quantization agreement gate: decode with int8 weights "
                    "(+ optional int8 cross-KV) vs the bf16 reference path "
                    "on fixed synthetic inputs; fails unless tokens match.",
    )
    p.add_argument("model", help="checkpoint (.safetensors/.cfg, npy dir, "
                                 "or .mpk.gz)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--kv", choices=["int8", "int4", "none"], default="int8",
                   help="also quantize the cross-attention KV cache")
    p.add_argument("--self-kv", choices=["int8", "none"], default="int8",
                   help="also quantize the self-attention KV cache")
    p.add_argument("--windows", type=int, default=8)
    p.add_argument("--max-depth", type=int, default=32)
    p.add_argument("--min-token-match", type=float, default=0.99)
    p.add_argument("-v", "--verbose", action="count", default=0)
    args = p.parse_args(argv)

    from .utils.logging import configure

    configure(args.verbose)
    _enable_compilation_cache()

    import json as _json

    import jax.numpy as jnp

    from .eval import agreement
    from .io import checkpoint
    from .quantize import quantize_params
    from .text.tokenizer import WhisperTokenizer

    params, cfg = checkpoint.load_params(args.model)
    import jax

    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if np.issubdtype(x.dtype, np.floating) else x, params)
    tok_path = args.tokenizer or os.path.join(
        os.path.dirname(os.path.abspath(args.model)), "tokenizer.json"
    )
    if os.path.exists(tok_path):
        tok = WhisperTokenizer(tok_path)
        prompt = tok.prompt_ids("en")
        suppress = tok.suppress_mask()
        eot = tok.eot
    else:  # no tokenizer next to the weights: structural ids still gate
        print(f"# no tokenizer at {tok_path}; using synthetic prompt",
              file=sys.stderr)
        v = cfg.text_decoder_config.n_vocab
        prompt, suppress, eot = [v - 8, v - 7, v - 6, v - 5], None, v - 1

    report = agreement.decode_agreement(
        params, quantize_params(params), cfg, eot_id=eot, prompt=prompt,
        suppress_mask=suppress, max_depth=args.max_depth,
        n_windows=args.windows,
        kv_quant_test=False if args.kv == "none" else args.kv,
        self_quant_test=args.self_kv == "int8",
    )
    print(_json.dumps(report))
    try:
        agreement.gate(report, min_token_match=args.min_token_match)
    except AssertionError as e:
        print(f"FAIL: {e}", file=sys.stderr)
        return 1
    print("PASS", file=sys.stderr)
    return 0


def cmd_finetune(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu finetune",
        description="Teacher-forced fine-tuning on (audio, text) pairs "
                    "(LibriSpeech-style directory or .tsv/.jsonl manifest). "
                    "Writes <out>.safetensors + <out>.cfg; optionally "
                    "orbax train-state checkpoints for resume.",
    )
    p.add_argument("model", help="starting checkpoint")
    p.add_argument("dataset", help="LibriSpeech-style dir or manifest "
                                   "(audio<TAB>text)")
    p.add_argument("lang", nargs="?", default="en")
    p.add_argument("--out", default=None,
                   help="output basename (default <model>-ft)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--task", choices=["transcribe", "translate"],
                   default="transcribe")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--spec-augment", action="store_true",
                   help="in-graph SpecAugment (freq + time masking)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer blocks (less HBM)")
    p.add_argument("--limit", type=int, default=None,
                   help="use only the first N dataset examples")
    p.add_argument("--save-every", type=int, default=0,
                   help="write an orbax train-state checkpoint to "
                        "<out>.ckpt every N steps (0 = off)")
    p.add_argument("--resume", default=None,
                   help="resume from an orbax train-state checkpoint dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-v", "--verbose", action="count", default=0)
    args = p.parse_args(argv)

    from .utils.logging import configure

    configure(args.verbose)
    _enable_compilation_cache()

    import jax
    import numpy as _np

    from .eval import wer as werlib
    from .io import checkpoint
    from .text.tokenizer import WhisperTokenizer
    from .training import checkpointing as ckpt
    from .training import data as tdata
    from .training import train as ttrain

    tok_path = args.tokenizer or os.path.join(
        os.path.dirname(os.path.abspath(args.model)), "tokenizer.json"
    )
    try:
        tok = WhisperTokenizer(tok_path)
    except Exception as e:
        print(f"Failed to load tokenizer: {e}", file=sys.stderr)
        return 1
    try:
        params, cfg = checkpoint.load_params(args.model)
    except Exception as e:
        print(f"Failed to load whisper model file: {e}", file=sys.stderr)
        return 1

    items = (werlib.iter_librispeech(args.dataset)
             if os.path.isdir(args.dataset)
             else werlib.iter_manifest(args.dataset))
    try:
        examples = tdata.load_examples(items, limit=args.limit)
    except Exception as e:
        print(f"Failed to load dataset: {e}", file=sys.stderr)
        return 1
    print(f"Loaded {len(examples)} examples")

    opt = ttrain.make_optimizer(
        learning_rate=args.lr, weight_decay=args.weight_decay,
        warmup_steps=args.warmup, total_steps=args.steps)
    state = ttrain.init_train_state(params, opt)
    if args.resume:
        state = ckpt.restore_train_state(args.resume, state)
        print(f"Resumed at step {int(state.step)}")
    step_fn = ttrain.make_train_step(cfg, opt, remat=args.remat)

    out = args.out or f"{args.model.rstrip('/')}-ft"
    aug_key = jax.random.PRNGKey(args.seed + 1)
    batches = tdata.iter_batches(
        examples, tok, cfg, args.batch_size, lang=args.lang, task=args.task,
        seed=args.seed)
    t0 = time.perf_counter()
    start = int(state.step)
    for i in range(start, args.steps):
        batch = next(batches)
        if args.spec_augment:
            aug_key, k = jax.random.split(aug_key)
            batch = batch._replace(mel=tdata.spec_augment(batch.mel, k))
        state, metrics = step_fn(state, batch)
        loss = float(metrics["loss"])
        if not _np.isfinite(loss):
            print(f"step {i}: non-finite loss {loss}; aborting",
                  file=sys.stderr)
            return 1
        if args.verbose or i % 10 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {loss:.4f} "
                  f"acc {float(metrics['accuracy']):.3f} "
                  f"grad_norm {float(metrics['grad_norm']):.3f}")
        if args.save_every and (i + 1) % args.save_every == 0:
            ckpt.save_train_state(os.path.abspath(f"{out}.ckpt"), state)
    dt = time.perf_counter() - t0
    checkpoint.save_safetensors(
        jax.device_get(state.params), cfg, f"{out}.safetensors")
    cfg.save(f"{out}.cfg")
    print(f"Saved {out}.safetensors + {out}.cfg "
          f"({args.steps - start} steps in {dt:.1f}s)")
    return 0


def cmd_detect_lang(argv) -> int:
    p = argparse.ArgumentParser(
        prog="whisper_tpu detect-lang",
        description="Identify the spoken language of an audio file "
                    "(multilingual models). Scans for speech-bearing "
                    "windows (energy VAD) so leading silence/music does "
                    "not misdetect. Prints a JSON line "
                    "{language, probs: {code: p, ...top-k}}.",
    )
    p.add_argument("model", help="checkpoint (.safetensors/.cfg, npy dir, "
                                 "or .mpk.gz)")
    p.add_argument("audio", help="16 kHz mono WAV/FLAC file")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--resample", action="store_true")
    p.add_argument("--top", type=int, default=5,
                   help="number of candidate languages to report")
    p.add_argument("--vote-windows", type=int, default=1,
                   help="average the distribution over up to this many "
                        "speech-bearing windows")
    p.add_argument("-v", "--verbose", action="count", default=0)
    args = p.parse_args(argv)

    from .utils.logging import configure

    configure(args.verbose)
    _enable_compilation_cache()

    import json as _json

    from .config import SAMPLE_RATE
    from .io import checkpoint, native as wav_native, wav
    from .pipeline.transcribe import Transcriber
    from .text.tokenizer import WhisperTokenizer

    try:
        waveform, rate = wav_native.load_audio(args.audio)
    except Exception as e:
        print(f"Failed to load audio file: {e}", file=sys.stderr)
        return 1
    if rate != SAMPLE_RATE:
        if not args.resample:
            print(f"The audio sample rate must be 16k (got {rate}); "
                  "pass --resample to convert.", file=sys.stderr)
            return 1
        waveform = wav.resample(waveform, rate, SAMPLE_RATE)
        rate = SAMPLE_RATE

    tok_path = args.tokenizer or os.path.join(
        os.path.dirname(os.path.abspath(args.model)), "tokenizer.json"
    )
    if not os.path.exists(tok_path):
        tok_path = "tokenizer.json"
    try:
        tok = WhisperTokenizer(tok_path)
    except Exception as e:
        print(f"Failed to load tokenizer: {e}", file=sys.stderr)
        return 1

    params, cfg = checkpoint.load_params(args.model)
    t = Transcriber(params, cfg, tok)
    try:
        code, dist = t.detect_language(waveform, rate,
                                       vote_windows=args.vote_windows)
    except ValueError as e:
        print(f"Language detection failed: {e}", file=sys.stderr)
        return 1
    top = sorted(dist.items(), key=lambda kv: -kv[1])[:max(1, args.top)]
    print(_json.dumps({
        "language": code,
        "probs": {c: round(p, 4) for c, p in top},
    }))
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: whisper_tpu {transcribe,convert,convert-pt,eval} ...",
              file=sys.stderr)
        print("  transcribe <model> <audio.wav> <lang> <out.txt>", file=sys.stderr)
        print("  convert <dump dir>", file=sys.stderr)
        print("  convert-pt <model.pt> <out name>", file=sys.stderr)
        print("  eval <model> <dataset> [lang]", file=sys.stderr)
        print("  transcribe-many <model> <lang> <out dir> <wav...>", file=sys.stderr)
        print("  quant-check <model>", file=sys.stderr)
        print("  detect-lang <model> <audio.wav>", file=sys.stderr)
        print("  finetune <model> <dataset> [lang]", file=sys.stderr)
        print("  serve <model> [--port ...]", file=sys.stderr)
        return 0 if argv else 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "transcribe":
        return cmd_transcribe(rest)
    if cmd == "transcribe-many":
        return cmd_transcribe_many(rest)
    if cmd == "convert":
        return cmd_convert(rest)
    if cmd == "convert-pt":
        return cmd_convert_pt(rest)
    if cmd == "eval":
        return cmd_eval(rest)
    if cmd == "quant-check":
        return cmd_quant_check(rest)
    if cmd == "detect-lang":
        return cmd_detect_lang(rest)
    if cmd == "finetune":
        return cmd_finetune(rest)
    if cmd == "serve":
        from .serve import main as serve_main

        return serve_main(rest)
    print(f"unknown command: {cmd}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
