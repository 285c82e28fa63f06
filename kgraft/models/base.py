"""Extraction-backend seam (SURVEY.md §7 "LLM-backend seam").

The reference drives extraction through an LLM in deterministic mode
(temperature 0, seed 1001, JSON mode — ``modules/PubMedFlow.py:71-73``,
``:98-105``), i.e. it *wants* extraction to behave like a pure function
of the input text. We honor that intent with a pluggable backend
interface:

* ``DeterministicBackend`` — rule/gazetteer extraction, the default for
  all tests and benchmarks (no network, exactly reproducible).
* ``LLMBackend`` — the shape of a batched chat-completion client
  (constructed once per actor, invoked per batch, JSON-mode responses
  decoded to the same Arrow schema). Left unimplemented in this sandbox
  (no network); it exists so a user can swap it in without touching the
  pipeline DAG — mirroring the reference's ``AzureOpenAIWrapper``
  (``modules/PubMedFlow.py:55-105``) without its credential coupling.

Backends are instantiated inside the actor's ``__init__`` (once per
worker), never per batch.
"""

from __future__ import annotations


class ExtractionBackend:
    """Interface: batch of segment texts -> list of extraction lists."""

    def extract(self, texts: list) -> list:  # pragma: no cover - interface
        raise NotImplementedError


class LLMBackend(ExtractionBackend):
    """A real LLM-client backend over the seam in :mod:`kgraft.models.llm`.

    Construction builds the chat client once per actor (the reference
    builds its Azure client in a pydantic validator,
    ``modules/PubMedFlow.py:87-96``); ``extract`` renders the 3-role
    prompt per text (``modules/PubMedFlow.py:147-208``), calls
    ``client.complete`` with retries, and decodes the JSON envelope.
    Any object with ``complete(messages) -> str`` plugs in; this sandbox
    has no network, so the offline deterministic
    :class:`kgraft.models.llm.FakeLLMClient` is the default — a real
    OpenAI/Azure wrapper drops in without touching the pipeline DAG.
    """

    def __init__(self, client=None, max_retries: int = 2):
        import json

        from .llm import FakeLLMClient, TransientLLMError, build_messages

        self.client = client if client is not None else FakeLLMClient()
        self.max_retries = max_retries
        self._json = json
        self._build = build_messages
        self._transient = TransientLLMError

    def extract(self, texts: list) -> list:
        """texts -> one list of (subj, pred, obj) tuples per text;
        malformed responses yield an empty list (callers wanting the
        dead-letter column use :class:`kgraft.models.llm.LLMTripleExtractor`)."""
        out = []
        for text in texts:
            rows = []
            try:
                last = None
                for _ in range(self.max_retries + 1):
                    try:
                        raw = self.client.complete(self._build(text))
                        break
                    except self._transient as e:
                        last = e
                else:
                    raise last
                for row in self._json.loads(raw)["data"].values():
                    if isinstance(row, list) and len(row) == 3:
                        rows.append(tuple(row))
            except Exception:
                rows = []
            out.append(rows)
        return out
