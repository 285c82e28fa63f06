"""The LLM extraction seam, made real (offline).

Re-expresses the reference's one genuinely LLM-shaped capability as a
Ray-Data actor-pool stage with a deterministic offline client:

* **3-role message templating** — the reference fills a
  system/user/assistant template triple per body section
  (``gondar/modules/PubMedFlow.py:108-129`` ``MessageTemplate.fill`` /
  ``MessagesWrapper.generate``, templates at ``:147-208``).
  :class:`MessageTemplate` / :func:`build_messages` mirror that shape
  with the KG task's heads (subject / predicate / object).
* **JSON-mode chat, deterministic decode** — the reference calls its
  Azure client with ``temperature=0, seed=1001`` and JSON response
  format (``PubMedFlow.py:68-73, 98-105``). :class:`FakeLLMClient` is
  the sandbox stand-in: a pure function of the prompt (rule-grammar
  extraction over the reference text) that answers the SAME JSON
  envelope — so the seam (template -> chat -> JSON -> Arrow) is fully
  exercised without a network. A real client drops in by implementing
  ``complete(messages) -> str``.
* **R1 response parse + dead-letter** — the reference ``json.loads``es
  the choice content and skips sections whose ``data == {}``
  (``PubMedFlow.py:243-246``); it has no malformed-JSON story (a bad
  response kills the loop). Here malformed responses land in a
  ``dead_letter`` error column on the SAME output schema — the block
  survives, the row is auditable, and downstream stages filter
  ``error IS NULL``.
* **Retry + rate-limit surface** — the reference declares
  ``tokens_per_min`` and ``MAX_RETRY`` but never enforces them
  (``gondar/utils/Flow.py:14``, ``settings/_DefaultConfig.py:22-24``);
  here ``max_retries`` is enforced per request with exponential
  backoff hooks, and ``tokens_per_min`` is tracked by the client
  (throttle events are counted; a real client would sleep).

Actor shape: client construction happens ONCE per actor
(``__init__``), batches flow through ``__call__`` — the A1/A2 pattern
(``PubMedFlow.py:87-96``) sized for ``map_batches(...,
concurrency=(lo, hi))``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa

from ..errors import KgraftError
from ..synth import PREDICATES

# ---------------------------------------------------------------------------
# message templating (reference: MessageTemplate / MessagesWrapper)

HEADS = ["Subject (Named Entity)", "Predicate (Relation)", "Object (Named Entity)"]

_SYSTEM_TEMPLATE = """You are an information extraction assistant.
Extract (subject, predicate, object) facts from the reference text.
Only use predicates from this inventory: {predicates}.
Present the result as a JSON object:
{{"headers": {heads}, "data": {{"row1": ["subj", "pred", "obj"], ...}}}}
If the text states no facts, return {{"headers": {heads}, "data": {{}}}}.
Every value must be sourced directly from the reference text."""

_USER_TEMPLATE = """Motivation:
{motivation}

Reference text:
{reference}

Find every fact matching the headers {heads}. Print JSON object:"""

_ASSISTANT_TEMPLATE = """I will check the reference text against the headers {heads} \
and answer with only the JSON object:"""


@dataclass(frozen=True)
class MessageTemplate:
    """One role + format template (reference ``PubMedFlow.py:108-113``)."""

    role: str
    template: str

    def fill(self, **kwargs) -> dict:
        return {"role": self.role, "content": self.template.format(**kwargs)}


TEMPLATES = [
    MessageTemplate("system", _SYSTEM_TEMPLATE),
    MessageTemplate("user", _USER_TEMPLATE),
    MessageTemplate("assistant", _ASSISTANT_TEMPLATE),
]

DEFAULT_MOTIVATION = (
    "Build a knowledge graph of organizations and people from web text."
)


def build_messages(reference: str, motivation: str = DEFAULT_MOTIVATION) -> list:
    """Render the 3-role message list for one reference text
    (reference ``MessagesWrapper.generate``, ``PubMedFlow.py:115-129``)."""
    preds = ", ".join(k for k, _ in PREDICATES)
    return [
        t.fill(
            reference=reference,
            heads=json.dumps(HEADS),
            motivation=motivation,
            predicates=preds,
        )
        for t in TEMPLATES
    ]


# ---------------------------------------------------------------------------
# clients


class TransientLLMError(KgraftError, RuntimeError):
    """Retryable failure (the shape a real client's 429/503 would take)."""

    kind = "transient_llm"


class FakeLLMClient:
    """Deterministic offline chat client (JSON mode, temperature 0).

    A pure function of the last user message: extracts facts with the
    same rule grammar as the deterministic backend and answers the
    reference's JSON envelope. Test/failure hooks:

    * ``garble_marker`` — a reference text containing it gets a
      TRUNCATED (malformed) JSON response: exercises the dead-letter
      path.
    * ``fail_first`` — the first N ``complete`` calls raise
      :class:`TransientLLMError`: exercises the retry path.
    * ``tokens_per_min`` — crude token accounting; exceeding the budget
      increments ``throttle_events`` (a real client would sleep here;
      deterministic tests must not).
    """

    def __init__(
        self,
        garble_marker: str = "@@GARBLE@@",
        fail_first: int = 0,
        tokens_per_min: int | None = None,
        seed: int = 1001,
    ):
        phrase_to_key = {phrase: key for key, phrase in PREDICATES}
        alternation = "|".join(
            re.escape(p)
            for p in sorted(phrase_to_key, key=len, reverse=True)
        )
        self._sentence_re = re.compile(
            f"(?P<subj>[^.]+?) (?P<phrase>{alternation}) (?P<obj>[^.]+?)\\."
        )
        self._phrase_to_key = phrase_to_key
        self.garble_marker = garble_marker
        self._fail_remaining = fail_first
        self.tokens_per_min = tokens_per_min
        self.tokens_used = 0
        self.throttle_events = 0
        self.seed = seed
        self.calls = 0

    def complete(self, messages: list) -> str:
        """messages -> JSON string (the choice content)."""
        self.calls += 1
        if self._fail_remaining > 0:
            self._fail_remaining -= 1
            raise TransientLLMError("synthetic transient failure")
        reference = self._reference_of(messages)
        approx_tokens = sum(len(m["content"]) for m in messages) // 4
        self.tokens_used += approx_tokens
        if self.tokens_per_min is not None and self.tokens_used > self.tokens_per_min:
            self.throttle_events += 1
            self.tokens_used = 0
        rows = {}
        for i, m in enumerate(self._sentence_re.finditer(reference)):
            rows[f"row{i + 1}"] = [
                m.group("subj").strip(),
                self._phrase_to_key[m.group("phrase")],
                m.group("obj").strip(),
            ]
        payload = json.dumps({"headers": HEADS, "data": rows})
        if self.garble_marker and self.garble_marker in reference:
            return payload[: max(3, len(payload) // 2)]  # truncated JSON
        return payload

    @staticmethod
    def _reference_of(messages: list) -> str:
        for m in messages:
            if m["role"] == "user":
                body = m["content"]
                if "Reference text:" in body:
                    body = body.split("Reference text:", 1)[1]
                return body.split("Find every fact", 1)[0].strip()
        return ""


# ---------------------------------------------------------------------------
# the actor-pool stage


def _empty_llm_out() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "seg_idx": pa.array([], pa.int32()),
            "subj": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj": pa.array([], pa.string()),
            "conf": pa.array([], pa.float32()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "error": pa.array([], pa.string()),
        }
    )


class LLMTripleExtractor:
    """Actor: segments -> TRIPLES rows + ``error`` dead-letter column.

    One client per actor (built in ``__init__``); per segment: render
    the 3-role prompt, call the client with ``max_retries``, decode the
    JSON envelope to Arrow rows. Decode failures and retry exhaustion
    become one dead-letter row per segment (``error`` non-null, fact
    columns null) instead of killing the block; ``data == {}`` segments
    are skipped exactly like the reference's R1 check
    (``PubMedFlow.py:243-246``).
    """

    def __init__(self, client_factory=None, max_retries: int = 2):
        self.client = (client_factory or FakeLLMClient)()
        self.max_retries = max_retries

    def _complete_with_retry(self, messages: list) -> str:
        last = None
        for _ in range(self.max_retries + 1):
            try:
                return self.client.complete(messages)
            except TransientLLMError as e:  # a real client backs off here
                last = e
        raise last

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _empty_llm_out()
        urls = batch["url"].to_pylist()
        segi = batch["seg_idx"].to_pylist()
        texts = batch["seg_text"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        o_url, o_seg, o_s, o_p, o_o, o_c, o_ts, o_err = ([] for _ in range(8))
        for url, si, text, ts in zip(urls, segi, texts, tss):
            try:
                raw = self._complete_with_retry(build_messages(text))
                doc = json.loads(raw)
                data = doc["data"]
                if not isinstance(data, dict):
                    # a real client may answer data as a list/null — that
                    # is a dead-letter row, never a dead block (the
                    # .values() below would otherwise raise OUTSIDE this
                    # try and kill the Ray task — review r2)
                    raise TypeError(f"data is {type(data).__name__}, not object")
            except Exception as e:
                o_url.append(url)
                o_seg.append(si)
                o_s.append(None)
                o_p.append(None)
                o_o.append(None)
                o_c.append(0.0)
                o_ts.append(ts)
                o_err.append(f"{type(e).__name__}: {e}")
                continue
            if data == {}:  # R1: nothing extracted for this section
                continue
            for row in data.values():
                if not isinstance(row, list) or len(row) != len(HEADS):
                    o_url.append(url)
                    o_seg.append(si)
                    o_s.append(None)
                    o_p.append(None)
                    o_o.append(None)
                    o_c.append(0.0)
                    o_ts.append(ts)
                    o_err.append(f"bad row shape: {row!r}")
                    continue
                o_url.append(url)
                o_seg.append(si)
                o_s.append(row[0])
                o_p.append(row[1])
                o_o.append(row[2])
                o_c.append(1.0)
                o_ts.append(ts)
                o_err.append(None)
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "seg_idx": pa.array(o_seg, pa.int32()),
                "subj": pa.array(o_s, pa.string()),
                "pred": pa.array(o_p, pa.string()),
                "obj": pa.array(o_o, pa.string()),
                "conf": pa.array(o_c, pa.float32()),
                "warc_ts": pa.array(o_ts, pa.timestamp("us")),
                "error": pa.array(o_err, pa.string()),
            }
        )


def split_dead_letters(triples_with_errors):
    """(ok_triples, dead_letters) — both Datasets; ok rows drop ``error``."""

    def ok(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_null(t["error"])).drop_columns(["error"])

    def bad(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t["error"]))

    return (
        triples_with_errors.map_batches(ok, batch_format="pyarrow"),
        triples_with_errors.map_batches(bad, batch_format="pyarrow"),
    )
