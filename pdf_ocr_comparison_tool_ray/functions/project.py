"""Project attribution: container(path)-based then content-based.

Reference semantics: ``project_detector.py:49-170`` —
(1) path match against per-project folder lists -> confidence 1.0;
(2) else content keyword scoring, score = count * len(keyword),
    confidence = score / max_score, top-1;
(3) else the "unassigned" fallback with confidence 0.0.

Our documents carry a ``source`` container column instead of filesystem
paths; project config maps sources -> project (the path rule analog).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from ..config import DEFAULT_PROJECT


class ProjectDetector:
    def __init__(self, projects: Dict[str, dict]):
        self.projects = projects
        self.source_to_project: Dict[str, str] = {}
        # F6 wildcard rules (project_detector.py:70-78: '*' in a folder
        # rule becomes '.*'); exact sources win over wildcards, wildcards
        # apply in declaration order
        self.wildcard_rules: List[Tuple[re.Pattern, str]] = []
        for name, cfg in projects.items():
            for src in cfg.get("sources", []):
                if "*" in src:
                    pat = ".*".join(re.escape(p) for p in src.lower().split("*"))
                    self.wildcard_rules.append((re.compile(f"^{pat}$"), name))
                else:
                    self.source_to_project.setdefault(src.lower(), name)
        # (project, keyword_lower) pairs in declaration order
        self.keyword_rules: List[Tuple[str, str]] = [
            (name, kw.lower())
            for name, cfg in projects.items()
            for kw in cfg.get("keywords", [])
        ]

    def detect_by_source(self, source: str) -> str | None:
        s = source.lower()
        hit = self.source_to_project.get(s)
        if hit is not None:
            return hit
        for pat, name in self.wildcard_rules:
            if pat.match(s):
                return name
        return None

    def detect_by_content(self, text: str) -> Tuple[str, float] | None:
        """Top-1 content match; score = count*len(kw) (project_detector.py:89-137)."""
        text_lower = text.lower()
        scores: Dict[str, int] = {}
        for name, kw in self.keyword_rules:
            count = text_lower.count(kw)
            if count:
                scores[name] = scores.get(name, 0) + count * len(kw)
        if not scores:
            return None
        max_score = max(scores.values())
        # declaration-order-stable argmax (matches SQL CASE chain)
        for name in self.projects:
            if scores.get(name) == max_score:
                return name, 1.0  # top-1 normalized by max -> always 1.0
        return None

    def detect(self, source: str, text: str = "") -> Tuple[str, float, str]:
        """-> (project, confidence, match_type) (project_detector.py:139-170)."""
        by_src = self.detect_by_source(source)
        if by_src is not None:
            return by_src, 1.0, "path"
        if text:
            by_content = self.detect_by_content(text)
            if by_content is not None:
                return by_content[0], by_content[1], "content"
        return DEFAULT_PROJECT, 0.0, "none"
