"""Data pipeline tests: tokenization/masking recipe, templates, name table,
mixer, loader (synthetic fixtures)."""

import json
import os
import tempfile
import wave

import numpy as np
import pytest

from macaw_llm_tpu.config import DataConfig, IGNORE_ID
from macaw_llm_tpu.data.datasets import (TokenizedDataset, build_alpaca,
                                         build_avsd, build_name_table,
                                         build_vqa, coco_pad_image_name,
                                         mix_datasets, tokenize_example)
from macaw_llm_tpu.data.loader import (BatchLoader, MediaSource, load_wav)
from macaw_llm_tpu.data.templates import (PROMPT_INPUT, PROMPT_NO_INPUT,
                                          format_full, format_prompt)


class FakeTokenizer:
    """Whitespace tokenizer for recipe tests (vocab-free)."""

    pad_token_id = 32006

    def encode(self, text: str):
        # id = stable hash of each whitespace token, bos prepended
        return [1] + [7 + (hash(w) % 31000) for w in text.split()]


class TestTemplates:
    def test_exact_reference_strings(self):
        # preprocess_data_supervised.py:27-38
        assert PROMPT_NO_INPUT.startswith(
            "Below is an instruction that describes a task. ")
        assert "### Instruction:\n{}\n\n### Response:" in PROMPT_NO_INPUT
        assert "### Input:\n{}" in PROMPT_INPUT
        assert format_prompt("Q", "") == PROMPT_NO_INPUT.format("Q")
        assert format_prompt("Q", "ctx") == PROMPT_INPUT.format("Q", "ctx")
        assert format_full("Q", "", "A").endswith("### Response:\n A \n\n")


class TestTokenizeExample:
    def test_masking_recipe(self):
        # reference preprocess_data_supervised.py:137-152
        tok = FakeTokenizer()
        prompt = format_prompt("what is this", "")
        out = tokenize_example(tok, prompt, "a cat", max_len=64)
        t_prompt = tok.encode(prompt)
        prefix_len = len(t_prompt) - 1
        assert (out["labels"][:prefix_len] == IGNORE_ID).all()
        # label at prefix_len equals the id at that position
        assert out["labels"][prefix_len] == out["input_ids"][prefix_len]
        # pad region: mask 0, labels ignored
        n_real = out["attention_mask"].sum()
        assert (out["labels"][n_real:] == IGNORE_ID).all()
        assert (out["input_ids"][n_real:] == tok.pad_token_id).all()

    def test_prompt_too_long_dropped(self):
        tok = FakeTokenizer()
        out = tokenize_example(tok, "w " * 300, "x", max_len=64)
        assert out is None

    def test_truncation(self):
        tok = FakeTokenizer()
        out = tokenize_example(tok, "short prompt", "y " * 500, max_len=32)
        assert out["input_ids"].shape == (32,)
        assert out["attention_mask"].sum() == 32


class TestBuilders:
    def test_alpaca_no_media(self):
        ds = build_alpaca(FakeTokenizer(),
                          [{"instruction": "a", "input": "", "output": "b"},
                           {"instruction": "c", "input": "d", "output": "e"}],
                          max_len=64)
        assert len(ds) == 2
        assert (ds.images == -1).all() and (ds.videos == -1).all()

    def test_vqa_name_lookup_with_coco_padding(self):
        table = build_name_table(
            ["COCO_train2014_000000000042.jpg"], ["vid1"])
        ds = build_vqa(FakeTokenizer(),
                       [{"instruction": "q", "output": "a",
                         "image": "COCO_train2014_42.jpg"}],
                       table["dict"], max_len=64)
        assert ds.images[0] == 0      # padded name resolved
        assert ds.audios[0] == -1

    def test_avsd_one_example_per_turn_shared_index(self):
        table = build_name_table([], ["vidA"])
        ds = build_avsd(FakeTokenizer(),
                        [{"video": "vidA",
                          "turns": [{"question": "q1", "answer": "a1"},
                                    {"question": "q2", "answer": "a2"}]}],
                        table["dict"], max_len=64)
        assert len(ds) == 2
        assert (ds.videos == 0).all() and (ds.audios == 0).all()
        assert (ds.images == -1).all()

    def test_coco_pad(self):
        assert coco_pad_image_name("COCO_train2014_42.jpg") == \
            "COCO_train2014_000000000042.jpg"

    def test_mix_and_roundtrip(self, tmp_path):
        tok = FakeTokenizer()
        a = build_alpaca(tok, [{"instruction": f"i{k}", "input": "",
                                "output": "o"} for k in range(10)], 32)
        b = build_alpaca(tok, [{"instruction": f"j{k}", "input": "",
                                "output": "o"} for k in range(10)], 32)
        mixed = mix_datasets(np.random.RandomState(0), [a, b], per_part=5)
        assert len(mixed) == 10
        p = str(tmp_path / "cache.npz")
        mixed.save(p)
        back = TokenizedDataset.load(p)
        np.testing.assert_array_equal(back.input_ids, mixed.input_ids)


def _write_wav(path, n=16000, sr=16000):
    t = np.arange(n) / sr
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


class TestLoader:
    def test_wav_roundtrip_pad(self, tmp_path):
        p = str(tmp_path / "a.wav")
        _write_wav(p, n=16000)
        audio = load_wav(p)
        assert audio.shape == (480000,)
        assert abs(audio[:16000]).max() > 0.2
        assert (audio[16000:] == 0).all()

    def test_batches_with_media(self, tmp_path):
        from PIL import Image
        img_dir = tmp_path / "frames"
        audio_dir = tmp_path / "audios"
        img_dir.mkdir()
        audio_dir.mkdir()
        # one video's frames + audio
        for i in [0, 2, 4, 6, 8, 11]:
            Image.fromarray(
                np.full((64, 64, 3), 100, np.uint8)).save(
                str(img_dir / f"vid1_{i}.jpg"))
        _write_wav(str(audio_dir / "vid1.wav"))

        dcfg = DataConfig(image_dir=str(img_dir) + "/",
                          audio_dir=str(audio_dir) + "/",
                          coco_dir=str(tmp_path) + "/",
                          n_stored_frames=12, n_sampled_frames=6)
        tok = FakeTokenizer()
        table = build_name_table([], ["vid1"])
        ds = build_avsd(tok, [{"video": "vid1",
                               "turns": [{"question": f"q{k}",
                                          "answer": "a"}
                                         for k in range(8)]}],
                        table["dict"], max_len=32)
        media = MediaSource(table["list"], dcfg, image_size=32, n_frames=6)
        loader = BatchLoader(ds, media, global_batch=4, accum=2, seed=0)
        batches = list(loader.epoch(0))
        assert len(batches) == loader.steps_per_epoch == 2
        b = batches[0]
        assert b["input_ids"].shape == (2, 2, 32)
        assert b["videos"].shape == (2, 2, 6, 32, 32, 3)
        assert b["audios"].shape == (2, 2, 480000)
        assert b["images"].shape == (2, 2, 32, 32, 3)
        # video present -> frames nonzero; image absent -> zeros
        assert b["videos"].max() > 0
        assert b["images"].max() == 0

    def test_deterministic_shuffle_per_epoch(self):
        tok = FakeTokenizer()
        ds = build_alpaca(tok, [{"instruction": f"i{k}", "input": "",
                                 "output": "o"} for k in range(16)], 48)
        assert len(ds) == 16
        l1 = BatchLoader(ds, None, global_batch=4, accum=1, seed=3)
        l2 = BatchLoader(ds, None, global_batch=4, accum=1, seed=3)
        b1 = [b["input_ids"] for b in l1.epoch(0)]
        b2 = [b["input_ids"] for b in l2.epoch(0)]
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x, y)
        e1 = [b["input_ids"] for b in l1.epoch(1)]
        assert not all((x == y).all() for x, y in zip(b1, e1))


class TestNativeLoader:
    """Native C++ media decode (native/libmacaw_media.so) vs Python paths."""

    @pytest.fixture(autouse=True)
    def require_lib(self):
        from macaw_llm_tpu.data import native
        if not native.available():
            pytest.skip("libmacaw_media.so not built")

    def test_wav_matches_python(self, tmp_path):
        from macaw_llm_tpu.data import native
        p = str(tmp_path / "n.wav")
        _write_wav(p, n=32000)
        nat = native.load_wav(p, 480000)
        # python path, bypassing native
        import wave as _w
        with _w.open(p, "rb") as w:
            raw = w.readframes(w.getnframes())
        py = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        np.testing.assert_allclose(nat[:32000], py, atol=1e-6)
        assert (nat[32000:] == 0).all()

    def test_jpeg_decode_close_to_pil(self, tmp_path):
        from PIL import Image
        from macaw_llm_tpu.data import native
        rng = np.random.RandomState(0)
        base = rng.rand(30, 40, 3)
        img = (np.kron(base, np.ones((16, 16, 1))) * 255).astype(np.uint8)
        p = str(tmp_path / "t.jpg")
        Image.fromarray(img).save(p, quality=95)
        with open(p, "rb") as f:
            nat = native.decode_jpeg_crop(f.read(), 224)
        assert nat is not None and nat.shape == (224, 224, 3)
        # PIL reference: shortest-side resize + center crop
        with Image.open(p) as im:
            im = im.convert("RGB")
            w, h = im.size
            if w < h:
                nw, nh = 224, max(224, round(224 * h / w))
            else:
                nw, nh = max(224, round(224 * w / h)), 224
            im = im.resize((nw, nh), Image.BILINEAR)
            left, top = (nw - 224) // 2, (nh - 224) // 2
            ref = np.asarray(im.crop((left, top, left + 224, top + 224)),
                             np.uint8)
        err = np.abs(nat.astype(np.float32) - ref.astype(np.float32)).mean()
        assert err < 8.0, f"mean abs err {err}"

    def test_loader_uses_native_for_jpg(self, tmp_path):
        from macaw_llm_tpu.data.loader import load_image
        from PIL import Image
        img = np.full((300, 400, 3), 77, np.uint8)
        p = str(tmp_path / "x.jpg")
        Image.fromarray(img).save(p)
        out = load_image(p, 224)
        assert out.shape == (224, 224, 3)
        assert abs(int(out.mean()) - 77) <= 2

    @staticmethod
    def _raw_wav(fmt=1, ch=1, rate=16000, bits=16, data=b""):
        import struct
        fmt_chunk = struct.pack("<HHIIHH", fmt, ch, rate,
                                rate * ch * max(bits, 1) // 8,
                                ch * max(bits, 1) // 8, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    def test_malformed_wav_rejected_not_crash(self, tmp_path):
        """bits_per_sample=0 used to SIGFPE the whole process (remotely
        reachable via serve audio_b64); must now return None."""
        from macaw_llm_tpu.data import native
        for kw in ({"bits": 0}, {"ch": 0}, {"ch": 99}, {"rate": 5},
                   {"fmt": 7}, {"fmt": 3, "bits": 16}):
            p = str(tmp_path / "bad.wav")
            with open(p, "wb") as f:
                f.write(self._raw_wav(data=b"\x00" * 64, **kw))
            assert native.load_wav(p, 480000) is None, kw

    def test_oversized_declared_data_len_bounded(self, tmp_path):
        """Attacker-declared 4GB data chunk in a tiny file must be clamped
        to the real file size, not drive the allocation."""
        import struct
        from macaw_llm_tpu.data import native
        raw = self._raw_wav(data=b"\x00\x01" * 100)
        raw = raw.replace(struct.pack("<I", 200),
                          struct.pack("<I", 0xFFFFFF00), 1)
        p = str(tmp_path / "huge.wav")
        with open(p, "wb") as f:
            f.write(raw)
        out = native.load_wav(p, 480000)
        assert out is not None and out.shape == (480000,)

    def test_non_16k_wav_resampled(self, tmp_path):
        """8 kHz source must be resampled to 16 kHz (1 s in -> 2 s of
        signal out), identically by the native and Python paths."""
        from macaw_llm_tpu.data import native
        import macaw_llm_tpu.data.native as native_mod
        from macaw_llm_tpu.data.loader import load_wav as py_load
        p = str(tmp_path / "r8.wav")
        _write_wav(p, n=8000, sr=8000)
        nat = native.load_wav(p, 480000)
        native_mod._LIB, native_mod._TRIED = None, True  # force py path
        try:
            py = py_load(p)
        finally:
            native_mod._TRIED = False
        assert abs(nat[:16000]).max() > 0.2
        assert (nat[16100:] == 0).all()
        np.testing.assert_allclose(nat, py, atol=1e-4)


class TestValBuilders:
    """Val-inference builders (reference preprocess_data_supervised.py:
    40-93) and the unsupervised instruction pipeline (:214-311)."""

    def test_vqa_val_rows(self):
        from macaw_llm_tpu.data.datasets import build_vqa_val
        ann = [{"image_path": "COCO_val2014_42.jpg", "question_id": 7,
                "multiple_choice_answer": "blue"}]
        qs = [{"question_id": 7, "image_id": 42,
               "question": "what color?"}]
        rows = build_vqa_val(ann, qs)
        assert rows == [{"image": "COCO_val2014_000000000042.jpg",
                         "video": "None", "audio": "None",
                         "instruction": "what color?",
                         "response": "blue"}]

    def test_avsd_val_rows(self):
        from macaw_llm_tpu.data.datasets import build_avsd_val
        md = {"vidA": {"data": [
            {"question": "q1", "answer": "a1"},
            {"question": "q2", "answer": "a2"}]}}
        rows = build_avsd_val(md, path="data/avsd/")
        assert len(rows) == 2
        assert rows[0]["video"] == "data/avsd/frames/vidA"
        assert rows[0]["audio"] == "data/avsd/audios/vidA.mp4.wav"
        assert rows[0]["image"] == "None"
        assert rows[1]["instruction"] == "q2"

    def test_val_loader_accepts_both_shapes(self, tmp_path):
        from macaw_llm_tpu.eval import load_val_examples
        wrapped = tmp_path / "w.json"
        bare = tmp_path / "b.json"
        rows = [{"instruction": "x", "response": "y"}] * 5
        wrapped.write_text(json.dumps({"data": rows}))
        bare.write_text(json.dumps(rows))
        assert len(load_val_examples(str(wrapped), 3)) == 3
        assert len(load_val_examples(str(bare), 10)) == 5


class TestInstructionPipeline:
    def test_content_filter(self):
        from macaw_llm_tpu.data.datasets import instruction_filter
        keep = {"instruction": "describe the scene", "response": "a dog"}
        assert instruction_filter(keep)
        # the reference's exact drop conditions (:51,172)
        assert not instruction_filter(
            {"instruction": "write a caption", "response": "a dog"})
        assert not instruction_filter(
            {"instruction": "x", "response": "image caption here"})
        assert not instruction_filter(
            {"instruction": "x", "response": "there is no dog"})
        assert not instruction_filter(
            {"instruction": "x", "response": "it is not clear"})
        # 'not' as substring (reference matches 'nothing' too)
        assert not instruction_filter(
            {"instruction": "x", "response": "nothing visible"})

    def test_build_instruction_coco_and_avsd(self):
        from macaw_llm_tpu.data.datasets import (
            build_instruction_avsd, build_instruction_coco,
            build_instruction_name_table)
        tok = FakeTokenizer()
        coco = [{"id": "c1", "instruction": "what is shown",
                 "response": "a tree"},
                {"id": "c2", "instruction": "write a caption",
                 "response": "skip me"}]
        avsd = [{"id": "v1", "instruction": "what happens",
                 "response": "a man waves"}]
        table = build_instruction_name_table(coco, avsd)
        assert table["list"] == ["c1", "c2", "v1"]
        ds_c = build_instruction_coco(tok, coco, table["dict"], 48)
        assert len(ds_c) == 1                     # caption row filtered
        assert ds_c.images[0] == 0 and ds_c.videos[0] == -1
        ds_v = build_instruction_avsd(tok, avsd, table["dict"], 48)
        assert len(ds_v) == 1
        assert ds_v.videos[0] == 2 == ds_v.audios[0]
        assert ds_v.images[0] == -1

    def test_cli_build_unsupervised_and_val(self, tmp_path, monkeypatch):
        import macaw_llm_tpu.run_preprocess as rp

        class CLIFakeTokenizer(FakeTokenizer):
            def add_special_tokens(self, d):
                return 0

            def save_pretrained(self, path):
                pass

        monkeypatch.setattr(
            "transformers.AutoTokenizer.from_pretrained",
            staticmethod(lambda *_a, **_k: CLIFakeTokenizer()))
        coco = tmp_path / "coco.json"
        coco.write_text(json.dumps({"data": [
            {"id": "c1", "instruction": "what is shown",
             "response": "a tree"}]}))
        avsd = tmp_path / "avsd.json"
        avsd.write_text(json.dumps({"data": [
            {"id": "v1", "instruction": "what happens",
             "response": "a man waves"}]}))
        out = tmp_path / "cache.npz"
        names = tmp_path / "names.json"
        rc = rp.main(["build-unsupervised", "--tokenizer", "x",
                      "--coco", str(coco), "--avsd", str(avsd),
                      "--out", str(out), "--names-out", str(names)])
        assert rc == 0
        ds = TokenizedDataset.load(str(out))
        assert len(ds) == 2
        assert json.load(open(names))["list"] == ["c1", "v1"]

        ann = tmp_path / "ann.json"
        ann.write_text(json.dumps({"annotations": [
            {"image_path": "COCO_val2014_9.jpg", "question_id": 1,
             "multiple_choice_answer": "yes"}]}))
        qs = tmp_path / "qs.json"
        qs.write_text(json.dumps({"questions": [
            {"question_id": 1, "question": "really?"}]}))
        md = tmp_path / "md.json"
        md.write_text(json.dumps(
            {"vidA": {"data": [{"question": "q", "answer": "a"}]}}))
        vout = tmp_path / "vqa_val_inference.json"
        aout = tmp_path / "avsd_val_inference.json"
        rc = rp.main(["build-val",
                      "--vqa-annotations", str(ann),
                      "--vqa-questions", str(qs), "--vqa-out", str(vout),
                      "--avsd-metadata", str(md), "--avsd-out", str(aout)])
        assert rc == 0
        from macaw_llm_tpu.eval import load_val_examples
        assert load_val_examples(str(vout), 10)[0]["response"] == "yes"
        assert load_val_examples(str(aout), 10)[0]["instruction"] == "q"

    def test_cli_resize_images(self, tmp_path):
        import macaw_llm_tpu.run_preprocess as rp
        from PIL import Image
        src = tmp_path / "src"
        out = tmp_path / "out"
        src.mkdir()
        Image.fromarray(
            np.zeros((700, 500, 3), np.uint8)).save(str(src / "a.jpg"))
        rc = rp.main(["resize-images", "--src", str(src),
                      "--out", str(out), "--size", "336"])
        assert rc == 0
        with Image.open(str(out / "a.jpg")) as im:
            assert max(im.size) == 336


class TestStreaming:
    """Streaming dataset mode (reference DataTrainingArguments.streaming,
    run_clm_llms.py:268-273) — JSONL shards, on-the-fly tokenize, bounded
    shuffle, BatchLoader-compatible epoch interface."""

    def _write_shards(self, tmp_path, n=40, shards=2):
        import json as _json
        paths = []
        per = n // shards
        for s in range(shards):
            p = tmp_path / f"shard{s}.jsonl"
            rows = []
            for i in range(s * per, (s + 1) * per):
                row = {"instruction": f"question {i}", "output": f"answer {i}"}
                if i % 3 == 0:
                    row["image"] = f"img{i}"
                rows.append(_json.dumps(row))
            p.write_text("\n".join(rows) + "\n")
            paths.append(str(p))
        return paths

    def test_batches_and_determinism(self, tmp_path):
        from macaw_llm_tpu.data.loader import StreamingBatchLoader
        paths = self._write_shards(tmp_path)
        tok = FakeTokenizer()
        mk = lambda: StreamingBatchLoader(
            paths, tok, global_batch=4, accum=2, max_text_len=48,
            shuffle_buffer=8, seed=3, steps_per_epoch=5)
        a = list(mk().epoch(0))
        b = list(mk().epoch(0))
        assert len(a) == 5
        for x, y in zip(a, b):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])
        # accum reshape: [A, B/A, L]
        assert a[0]["input_ids"].shape == (2, 2, 48)
        # different epoch -> different order
        c = list(mk().epoch(1))
        assert any((x["input_ids"] != y["input_ids"]).any()
                   for x, y in zip(a, c))

    def test_skip_resume_exact(self, tmp_path):
        from macaw_llm_tpu.data.loader import StreamingBatchLoader
        paths = self._write_shards(tmp_path)
        tok = FakeTokenizer()
        mk = lambda: StreamingBatchLoader(
            paths, tok, global_batch=4, accum=1, max_text_len=48,
            shuffle_buffer=8, seed=3, steps_per_epoch=5)
        full = list(mk().epoch(0))
        tail = list(mk().epoch(0, skip=3))
        assert len(tail) == 2
        for x, y in zip(full[3:], tail):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])

    def test_skip_resume_with_rejected_rows(self, tmp_path):
        """A batch consumes rows until global_batch VALID ones; skip must
        replay the same consumption (over-long rows rejected identically)
        or resume desyncs."""
        import json as _json
        from macaw_llm_tpu.data.loader import StreamingBatchLoader
        rows = []
        for i in range(48):
            if i % 5 == 0:  # over-long prompt -> tokenize_example rejects
                rows.append(_json.dumps(
                    {"instruction": " ".join(f"w{j}" for j in range(80)),
                     "output": "x"}))
            else:
                rows.append(_json.dumps(
                    {"instruction": f"q {i}", "output": f"a {i}"}))
        p = tmp_path / "rows.jsonl"
        p.write_text("\n".join(rows) + "\n")
        tok = FakeTokenizer()
        mk = lambda: StreamingBatchLoader(
            [str(p)], tok, global_batch=4, accum=1, max_text_len=48,
            shuffle_buffer=8, seed=7, steps_per_epoch=5)
        full = list(mk().epoch(0))
        tail = list(mk().epoch(0, skip=2))
        for x, y in zip(full[2:], tail):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])

    def test_process_sharding_disjoint(self, tmp_path):
        from macaw_llm_tpu.data.loader import stream_jsonl
        paths = self._write_shards(tmp_path, n=10, shards=1)
        r0 = [r["instruction"] for r in stream_jsonl(paths, 0, 2)]
        r1 = [r["instruction"] for r in stream_jsonl(paths, 1, 2)]
        assert len(r0) == len(r1) == 5
        assert not set(r0) & set(r1)

    def test_prompt_format_and_alpaca_fields(self, tmp_path):
        import json as _json
        from macaw_llm_tpu.data.loader import StreamingBatchLoader
        p = tmp_path / "rows.jsonl"
        p.write_text("\n".join([
            _json.dumps({"instruction": "inst", "input": "ctx",
                         "output": "out"}),
            _json.dumps({"prompt": "PREBUILT", "output": "out2"}),
        ]) + "\n")
        tok = FakeTokenizer()
        ldr = StreamingBatchLoader([str(p)], tok, global_batch=2,
                                   max_text_len=64, shuffle_buffer=1,
                                   seed=0, steps_per_epoch=1)
        ex1 = ldr._row_to_example({"instruction": "inst", "input": "ctx",
                                   "output": "out"})
        ex2 = ldr._row_to_example({"prompt": "PREBUILT", "output": "out2"})
        assert ex1 is not None and ex2 is not None
        t, ids = ex1
        assert ids == (-1, -1, -1)
        ref = tokenize_example(tok, format_prompt("inst", "ctx"), "out", 64)
        np.testing.assert_array_equal(t["input_ids"], ref["input_ids"])
        ref2 = tokenize_example(tok, "PREBUILT", "out2", 64)
        np.testing.assert_array_equal(ex2[0]["input_ids"],
                                      ref2["input_ids"])

    def test_name_table_mapping(self, tmp_path):
        from macaw_llm_tpu.data.loader import StreamingBatchLoader
        tok = FakeTokenizer()
        ldr = StreamingBatchLoader(
            [], tok, name_table={"img7": 7, "vidX": 3},
            global_batch=1, steps_per_epoch=1)
        _, ids = ldr._row_to_example(
            {"prompt": "p", "output": "o", "image": "img7",
             "video": "vidX", "audio": "unknown-name"})
        assert ids == (7, -1, 3)
