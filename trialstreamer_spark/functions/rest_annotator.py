"""Deploy-ready RobotReviewer REST client (SURVEY S20).

Implements the reference's queue/poll/report protocol exactly
(reference pubmed.py:320-345, duplicated medrxiv_cov.py:46-67):

    POST {base}queue-documents   {"articles": [...], "robots": [...],
                                  "filter_rcts": ...}   -> {"report_id"}
    GET  {base}report-status/{report_id}   poll until state == "SUCCESS"
                                           (0.3 s between polls)
    GET  {base}report/{report_id}          -> per-article prediction list

with the api-key header on every request and retry/backoff around each
HTTP call (config.json.example ``download_retry_attempts`` = 3, the
reference's download retry discipline applied to the model service).

``RESTAnnotator`` presents the same duck-type as
``DeterministicStubAnnotator`` (functions/annotate.py), so the Spark
seam is unchanged: ``annotate_articles`` / ``annotate_pico_articles``
hand each Arrow partition-batch to ``annotate``/``annotate_pico``,
which sub-chunks it into protocol requests (the reference posts 5000
articles per classify request, 100 per PICO request) — so request size
is a client knob while Spark's partitioning supplies the concurrency
(one in-flight report per executor task, vs. the reference's single
serial loop).

The TRANSPORT is injectable: anything with
``post_json(url, payload, headers) -> dict`` and
``get_json(url, headers) -> dict``. The default transport is built
lazily from ``requests`` at first use — absent in this container (no
network), so tests drive the full protocol state machine with fake
transports and the sandbox default annotator remains the deterministic
stub.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

import pandas as pd

#: classify()-leg robots (reference pubmed.py:372) and PICO-leg robots
#: (reference pubmed.py:606).
CLASSIFY_ROBOTS = ("rct_bot", "human_bot")
PICO_ROBOTS = ("pico_span_bot", "sample_size_bot", "bias_ab_bot", "punchline_bot")

#: reference batch sizes: upload_to_postgres batch_size=5000 feeds
#: classify(); annotate_rcts uses batch_size=100 for the PICO bots.
CLASSIFY_BATCH = 5000
PICO_BATCH = 100


class _RequestsTransport:
    """Default HTTP transport; built lazily so environments without the
    ``requests`` package (this container) can still import the module
    and inject their own transport."""

    def __init__(self) -> None:
        import requests  # deferred: not installed in the sandbox

        self._requests = requests

    def post_json(self, url: str, payload: dict, headers: dict) -> dict:
        r = self._requests.post(url, json=payload, headers=headers)
        r.raise_for_status()
        return r.json()

    def get_json(self, url: str, headers: dict) -> dict:
        r = self._requests.get(url, headers=headers)
        r.raise_for_status()
        return r.json()


class AnnotationServiceError(RuntimeError):
    """The service reported a terminal failure (poison batch) or kept
    failing past the retry budget."""


class RESTAnnotator:
    """RobotReviewer client speaking the reference protocol, shaped as a
    drop-in ``Annotator`` for the functions/annotate.py seam.

    Parameters mirror the reference's config surface:
    ``base_url``/``api_key`` = ROBOTREVIEWER_URL/ROBOTREVIEWER_API_KEY;
    ``retry_attempts`` = download_retry_attempts (default 3);
    ``poll_interval_s`` = the hard-coded 0.3 s poll of pubmed.py:344;
    ``poll_timeout_s`` bounds a stuck report (the reference polls
    forever — a deployability fix, not a semantic change). ``sleep`` and
    ``clock`` are injectable so tests assert the backoff schedule and the
    timeout deadline deterministically; the timeout is a wall-clock
    deadline (``clock() >= start + poll_timeout_s``), so time spent in
    slow HTTP calls and retry backoffs counts toward it — counting only
    scheduled poll sleeps would let a slow-but-responsive service overrun
    the bound arbitrarily.
    """

    def __init__(
        self,
        base_url: str,
        api_key: str = "",
        transport=None,
        retry_attempts: int = 3,
        backoff_s: float = 1.0,
        poll_interval_s: float = 0.3,
        poll_timeout_s: float = 3600.0,
        classify_batch: int = CLASSIFY_BATCH,
        pico_batch: int = PICO_BATCH,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.base_url = base_url
        self.api_key = api_key
        self.transport = transport
        self.retry_attempts = max(1, int(retry_attempts))
        self.backoff_s = backoff_s
        self.poll_interval_s = poll_interval_s
        self.poll_timeout_s = poll_timeout_s
        self.classify_batch = classify_batch
        self.pico_batch = pico_batch
        self._sleep = sleep
        self._clock = clock

    # -- protocol state machine ------------------------------------------

    def _headers(self) -> dict:
        return {"api-key": self.api_key}

    def _transport(self):
        if self.transport is None:
            self.transport = _RequestsTransport()
        return self.transport

    def _with_retry(self, call: Callable[[], dict], what: str) -> dict:
        """Retry an HTTP call up to retry_attempts with exponential
        backoff (1x, 2x, 4x … backoff_s) — the reference's download
        retry discipline (pubmed.py:224-232) applied per request."""
        last: Exception | None = None
        for attempt in range(1, self.retry_attempts + 1):
            try:
                return call()
            except Exception as exc:  # noqa: BLE001 — transport-defined
                last = exc
                if attempt < self.retry_attempts:
                    self._sleep(self.backoff_s * (2 ** (attempt - 1)))
        raise AnnotationServiceError(
            f"{what} failed after {self.retry_attempts} attempts: {last}"
        ) from last

    def predict(
        self,
        articles: list[dict],
        tasks: Iterable[str],
        filter_rcts: str = "none",
    ) -> list:
        """queue-documents → poll report-status → fetch report (the
        reference's predict(), pubmed.py:320-345)."""
        t = self._transport()
        payload = {
            "articles": articles,
            "robots": list(tasks),
            "filter_rcts": filter_rcts,
        }
        queued = self._with_retry(
            lambda: t.post_json(
                self.base_url + "queue-documents", payload, self._headers()
            ),
            "queue-documents",
        )
        if "report_id" not in queued:
            # the reference's exact invalid-response guard (pubmed.py:330-331)
            raise AnnotationServiceError(
                f"Invalid response for RobotReviewer API request: {queued}"
            )
        report_id = queued["report_id"]

        # Wall-clock deadline: slow HTTP round-trips and retry backoffs
        # count toward the bound, not just the scheduled poll sleeps.
        start = self._clock()
        deadline = start + self.poll_timeout_s
        while True:
            status = self._with_retry(
                lambda: t.get_json(
                    self.base_url + "report-status/" + report_id, self._headers()
                ),
                "report-status",
            )
            state = status.get("state")
            if state == "SUCCESS":
                break
            if state in ("FAILURE", "REVOKED"):
                raise AnnotationServiceError(
                    f"report {report_id} terminal state {state!r} (poison batch)"
                )
            if self._clock() >= deadline:
                raise AnnotationServiceError(
                    f"report {report_id} not ready after "
                    f"{self._clock() - start:.0f}s"
                )
            self._sleep(self.poll_interval_s)

        return self._with_retry(
            lambda: t.get_json(
                self.base_url + "report/" + report_id, self._headers()
            ),
            "report",
        )

    # -- Annotator duck-type ----------------------------------------------

    def annotate(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """classify() leg (reference pubmed.py:348-389): ti/ab rows to
        rct_bot+human_bot, keys riding positionally WITHIN one request
        (the service returns predictions in submission order — J5), and
        re-attached as the pmid column so everything downstream joins
        by key."""
        out: list[dict] = []
        for start in range(0, len(pdf), self.classify_batch):
            chunk = pdf.iloc[start : start + self.classify_batch]
            x = [
                {"ti": r.title, "ab": r.abstract_plaintext}
                for r in chunk.itertuples(index=False)
            ]
            preds = self.predict(x, tasks=CLASSIFY_ROBOTS, filter_rcts="none")
            if len(preds) != len(chunk):
                raise AnnotationServiceError(
                    f"report row count {len(preds)} != submitted {len(chunk)}"
                )
            for pmid, pred in zip(chunk["pmid"], preds):
                out.append(
                    {
                        "pmid": str(pmid),
                        "clf_type": pred["rct_bot"]["model"],
                        "clf_score": float(pred["rct_bot"]["score"]),
                        "rct_probability": float(
                            pred["rct_bot"]["preds"]["probability"]
                        ),
                        "is_human": bool(pred["human_bot"]["is_human"]),
                    }
                )
        return pd.DataFrame(out)

    def annotate_pico(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """annotate_rcts leg (reference pubmed.py:561-635): pmid/ti/ab
        rows through the four PICO-family bots; the report itself
        carries pmid back. Applies the reference's sample-size guard
        ('not found' or >1e6 → null, pubmed.py:611-613)."""
        out: list[dict] = []
        for start in range(0, len(pdf), self.pico_batch):
            chunk = pdf.iloc[start : start + self.pico_batch]
            x = [
                {"pmid": str(r.pmid), "ti": r.title, "ab": r.abstract_plaintext}
                for r in chunk.itertuples(index=False)
            ]
            for a in self.predict(x, tasks=PICO_ROBOTS, filter_rcts="none"):
                sample_size = a.get("sample_size_bot", {}).get("num_randomized")
                if sample_size == "not found" or (
                    sample_size is not None and int(sample_size) > 1_000_000
                ):
                    sample_size = None
                span = a["pico_span_bot"]
                out.append(
                    {
                        "pmid": str(a["pmid"]),
                        "population": span["population"],
                        "interventions": span["interventions"],
                        "outcomes": span["outcomes"],
                        "population_mesh": span["population_mesh"],
                        "interventions_mesh": span["interventions_mesh"],
                        "outcomes_mesh": span["outcomes_mesh"],
                        "num_randomized": (
                            None if sample_size is None else int(sample_size)
                        ),
                        "prob_low_rob": float(a["bias_ab_bot"]["prob_low_rob"]),
                        "punchline_text": a["punchline_bot"]["punchline_text"],
                        "effect": a["punchline_bot"]["effect"],
                    }
                )
        res = pd.DataFrame(out)
        if len(res):
            # nullable int, not float-with-NaN: the guard's nulls must
            # survive the Arrow boundary as integer nulls
            res["num_randomized"] = res["num_randomized"].astype("Int64")
        return res
