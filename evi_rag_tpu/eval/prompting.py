"""Prompt construction for the reasoner (JSON-answer contract).

Functional re-design of ``src/utils/llm_prompting.py:11-43``: evidence
(triplets or path chains) + question + an instruction demanding strict
``{"answers": [...]}`` JSON -- the contract ``eval/llm_metrics.py`` parses.
"""

from __future__ import annotations

from typing import Mapping, Sequence

JSON_ANSWER_INSTRUCTION = (
    'Respond with JSON only, of the form {"answers": ["<entity>", ...]} '
    "listing every answer entity. If the evidence supports no answer, "
    'respond {"answers": []}. Copy entity strings verbatim from the evidence.'
)


def triplet_to_str(triplet: tuple[str, str, str]) -> str:
    h, r, t = triplet
    return f"({h}, {r}, {t})"


def build_triplet_prompt(
    question: str, triplets: Sequence[tuple[str, str, str]], limit: int
) -> str:
    lines = [triplet_to_str(t) for t in triplets[:limit]]
    evidence = "Triplets:\n" + "\n".join(lines) if lines else "Triplets:\n"
    return "\n\n".join([evidence, f"Question:\n{question}", JSON_ANSWER_INSTRUCTION])


def build_path_prompt(
    *,
    question: str,
    chains: Sequence[Mapping[str, object]],
    limit: int,
    include_meta: bool = False,
    instruction: str = JSON_ANSWER_INSTRUCTION,
) -> str:
    lines = []
    for i, chain in enumerate(chains[:limit], 1):
        meta = (
            f"[freq={chain.get('frequency', 0)},len={chain.get('length', 0)}] "
            if include_meta
            else ""
        )
        lines.append(f"{i}. {meta}{chain.get('chain_text', '')}")
    evidence = "Paths:\n" + "\n".join(lines)
    return "\n\n".join([evidence, f"Question:\n{question}", instruction])


def count_tokens(text: str, *, model: str = "gpt-4o-mini") -> int:
    """Token count for evidence-window budgeting (host-side tiktoken;
    reference ``src/utils/text_utils.py:6-18``)."""
    try:
        import tiktoken

        try:
            enc = tiktoken.encoding_for_model(model)
        except KeyError:
            enc = tiktoken.get_encoding("cl100k_base")
        return len(enc.encode(text))
    except Exception:
        # Fallback heuristic when tiktoken is unavailable offline.
        return max(1, len(text) // 4)
