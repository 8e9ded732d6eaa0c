"""Seeded synthetic corpus for unit/integration fixtures.

Generates flat (doc_id, text, lang, source) documents whose text embeds
the reference's extractable patterns — dates (``ocr_engine.py:325-329``),
amounts (``:332-337``), IDs (``:340-345``), document-type keywords
(``config.yaml:92-122``) and the canned smoke-test sentences from
``content_matcher.py:511-553`` — plus plain ASCII filler, so feature
extraction, classification and matching all exercise the same code paths
the reference author exercised.  Includes a skew tail: a few documents
with ~100x the median length, to exercise explode+repartition.
"""

from __future__ import annotations

import random
from typing import Dict, List

_ASCII_VOCAB = (
    "the quick data pipeline spark join window stream batch table column row "
    "merge sort filter query hash vector customer order part agg group scan"
).split()

_CJK_SENTENCES = [
    "生物孵化器SARS项目加固工程款 日期：2003-05-31 金额：300000元",
    "生物孵化器SARS项目加固工程款（首期）日期：2003-05-31 金额：300000元",
    "记账凭证 借方 贷方 科目 合计：1,234.56",
    "工程建设合同书 甲方 乙方 协议 合同号：HT2024001",
    "会议纪要 议定事项 2024年3月15日",
    "增值税发票 税额 价税合计 发票号：FP88001234",
    "资金申请 拨款 经费 ¥50,000.00",
    "审批单 批准 签发 编号：SP-2024-017",
    "工程报告 竣工 验收 施工 2024.06.30",
    "招标文件 投标 中标 标书 2024/07/01",
]


def make_corpus(n_docs: int = 50, seed: int = 42, skew_docs: int = 2) -> List[Dict]:
    """Flat docs; last ``skew_docs`` get ~100x median length (skew tail)."""
    rng = random.Random(seed)
    docs: List[Dict] = []
    for i in range(n_docs):
        doc_id = f"doc{i:05d}"
        is_skew = i >= n_docs - skew_docs
        n_words = rng.randint(2000, 3000) if is_skew else rng.randint(20, 120)
        parts: List[str] = []
        while sum(len(p.split(" ")) for p in parts) < n_words:
            if rng.random() < 0.25:
                parts.append(rng.choice(_CJK_SENTENCES))
            else:
                parts.append(" ".join(rng.choice(_ASCII_VOCAB) for _ in range(rng.randint(5, 12))))
        text = " ".join(parts)
        docs.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": rng.choice(["en", "zh", "es", "fr", "de"]),
                "source": f"src{rng.randint(0, 9)}",
            }
        )
    return docs
