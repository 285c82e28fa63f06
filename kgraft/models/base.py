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
    """Stub for a real LLM client (JSON mode, temperature 0, fixed seed).

    Construction would build the chat client once (the reference builds
    its Azure client in a pydantic validator, ``modules/PubMedFlow.py:87-96``);
    ``extract`` would render the 3-message prompt per text
    (``modules/PubMedFlow.py:147-208``), call the API batched, and decode
    the JSON rows. No network in this sandbox -> explicitly unavailable.
    """

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "LLMBackend requires network credentials; use DeterministicBackend"
        )
