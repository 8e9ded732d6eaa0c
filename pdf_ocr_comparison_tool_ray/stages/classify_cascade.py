"""Rule -> LLM classification cascade as a filter-split pipeline.

Reference M11–M13: ``document_classifier.py:284-319`` — rule classifier
first; if its confidence < 0.7 AND the LLM is enabled, ask the LLM
(prompt over the first 2000 chars, ``:163-179``; response parsed with
regexes for 类型/置信度, ``:223-253``) and keep whichever answer has the
higher confidence.

Ray-native topology (the idiomatic form SURVEY M12 names): one stateless
rule pass adds (doc_type, type_confidence); a filter splits confident
rows from doubtful ones; only the doubtful slice flows through the
model-holding actor pool; union of the two branches.  The "LLM" here is
a deterministic mock with the real engine's full shape — prompt
template, generate call slot in ``__init__``, regex response parse — so
a HF model drops into ``_generate`` unchanged.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import DOCUMENT_TYPES_ZH
from ..functions.classify import RuleClassifier

_PROMPT = "请判断以下文档的类型。\n候选类型: {types}\n文档内容:\n{text}\n"
_TYPE_RE = re.compile(r"类型[:：]\s*(\S+)")
_CONF_RE = re.compile(r"置信度[:：]\s*([0-9.]+)")

# explicit output schema: union() requires block-schema equality, and an
# empty filtered block would otherwise infer null for its string columns
# (the match_shuffle._KEYED_SCHEMA hazard)
def _out_schema(doc_id_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            ("doc_id", doc_id_type),
            ("doc_type", pa.string()),
            ("type_confidence", pa.float64()),
            ("classifier", pa.string()),
        ]
    )


class MockLLMClassifier:
    """Actor-pool stage; a real HF pipeline loads in ``__init__`` and
    replaces ``_generate`` (document_classifier.py:129-161)."""

    def __init__(self, doc_types: dict | None = None, prompt_chars: int = 2000):
        self.doc_types = list((doc_types or DOCUMENT_TYPES_ZH).keys())
        self.prompt_chars = prompt_chars
        # model/tokenizer load slot (deterministic mock here)
        self._generate = self._mock_generate

    def _mock_generate(self, prompt: str) -> str:
        """Deterministic stand-in: keyword-free hash vote over the prompt,
        emitting the reference's expected response format."""
        digest = hashlib.md5(prompt.encode()).digest()
        choice = self.doc_types[digest[0] % len(self.doc_types)]
        conf = 0.80 + (digest[1] % 20) / 100.0  # 0.80–0.99
        return f"类型：{choice}\n置信度：{conf:.2f}\n理由：mock"

    def classify_one(self, text: str) -> tuple[str, float]:
        prompt = _PROMPT.format(
            types="/".join(self.doc_types), text=text[: self.prompt_chars]
        )
        resp = self._generate(prompt)
        m_t, m_c = _TYPE_RE.search(resp), _CONF_RE.search(resp)
        if not m_t:  # reference falls back to 其他/other on parse failure
            return "other", 0.5
        conf = float(m_c.group(1)) if m_c else 0.5
        return m_t.group(1), min(conf, 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rule_types = batch["doc_type"].to_pylist()
        rule_confs = batch["type_confidence"].to_pylist()
        out_t, out_c, out_src = [], [], []
        for text, rt, rc in zip(batch["text"].to_pylist(), rule_types, rule_confs):
            lt, lc = self.classify_one(text)
            # M12: keep the higher-confidence answer
            if lc > rc:
                out_t.append(lt)
                out_c.append(lc)
                out_src.append("llm")
            else:
                out_t.append(rt)
                out_c.append(rc)
                out_src.append("rule")
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(out_t, type=pa.string()),
                pa.array(out_c, type=pa.float64()),
                pa.array(out_src, type=pa.string()),
            ],
            schema=_out_schema(batch.schema.field("doc_id").type),
        )


def classify_cascade(
    ds: ray.data.Dataset,
    doc_types: dict | None = None,
    llm_threshold: float = 0.7,
    llm_concurrency=(2, 8),
) -> ray.data.Dataset:
    """(doc_id, text) rows -> (doc_id, doc_type, type_confidence, classifier).

    Confident rule rows never touch the LLM pool (filter-split + union).
    llm_concurrency autoscales by default: a fixed 2-actor pool caps the
    doubtful fraction at volume (interleaved 1.28M-doc probe: 42-63 s
    fixed vs 17-19 s autoscaled); at real deployment size it to the GPU
    count.
    """
    types = doc_types or DOCUMENT_TYPES_ZH

    def rule_pass(batch: pa.Table) -> pa.Table:
        clf = RuleClassifier(types)
        t, c = clf.classify_many(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "doc_type": pa.array(t, type=pa.string()),
                "type_confidence": pa.array(c, type=pa.float64()),
            }
        )

    ruled = ds.map_batches(rule_pass, batch_format="pyarrow")

    def keep_confident(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t["type_confidence"], llm_threshold))
        return kept.select(["doc_id", "doc_type", "type_confidence"]).append_column(
            "classifier", pa.array(["rule"] * len(kept), type=pa.string())
        )

    confident = ruled.map_batches(keep_confident, batch_format="pyarrow")
    doubtful = ruled.map_batches(
        lambda t: t.filter(pc.less(t["type_confidence"], llm_threshold)),
        batch_format="pyarrow",
    )
    refined = doubtful.map_batches(
        MockLLMClassifier,
        batch_format="pyarrow",
        concurrency=llm_concurrency,
        fn_constructor_kwargs={"doc_types": types},
    )
    return confident.union(refined)
