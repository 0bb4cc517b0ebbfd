"""RESTAnnotator protocol state machine (SURVEY S20 — reference
pubmed.py:320-345 queue/poll/report), driven end-to-end with fake
transports: happy path, retry-then-success backoff, exhausted retries,
poison batch, invalid queue response, poll timeout, request chunking,
and the Spark-seam swap through annotate_articles."""

from __future__ import annotations

import pandas as pd
import pytest

from trialstreamer_spark.functions.annotate import (
    annotate_articles,
    annotate_pico_articles,
)
from trialstreamer_spark.functions.rest_annotator import (
    AnnotationServiceError,
    RESTAnnotator,
)

BASE = "http://rr.example/api/"


class FakeService:
    """In-memory RobotReviewer honoring the reference protocol, with
    injectable failure modes. Deterministic: scores derive from the
    submitted titles, so executor-side copies answer identically."""

    def __init__(self, pending_polls=0, fail_queue_times=0, fail_state=None):
        self.pending_polls = pending_polls
        self.fail_queue_times = fail_queue_times
        self.fail_state = fail_state
        self.calls: list[tuple[str, str, str | None]] = []
        self._reports: dict[str, list] = {}
        self._polls: dict[str, int] = {}
        self._n = 0

    def post_json(self, url, payload, headers):
        self.calls.append(("POST", url, headers.get("api-key")))
        assert url == BASE + "queue-documents"
        assert set(payload) == {"articles", "robots", "filter_rcts"}
        if self.fail_queue_times > 0:
            self.fail_queue_times -= 1
            raise ConnectionError("connection reset")
        self._n += 1
        rid = f"r{self._n}"
        self._reports[rid] = self._make_report(payload)
        self._polls[rid] = 0
        return {"report_id": rid}

    def get_json(self, url, headers):
        self.calls.append(("GET", url, headers.get("api-key")))
        rid = url.rsplit("/", 1)[1]
        if "report-status/" in url:
            if self.fail_state:
                return {"state": self.fail_state}
            self._polls[rid] += 1
            done = self._polls[rid] > self.pending_polls
            return {"state": "SUCCESS" if done else "PENDING"}
        assert "report/" in url
        return self._reports[rid]

    def _make_report(self, payload):
        arts = payload["articles"]
        if "rct_bot" in payload["robots"]:
            return [
                {
                    "rct_bot": {
                        "model": "svm_cnn",
                        "score": float(len(a["ti"])),
                        "preds": {"probability": 0.5},
                    },
                    "human_bot": {"is_human": True},
                }
                for a in arts
            ]
        return [
            {
                "pmid": a["pmid"],
                "pico_span_bot": {
                    "population": ["pop"],
                    "interventions": ["int"],
                    "outcomes": ["out"],
                    "population_mesh": [],
                    "interventions_mesh": [],
                    "outcomes_mesh": [],
                },
                # exercise all three guard arms deterministically
                "sample_size_bot": {
                    "num_randomized": ["120", "not found", 2_000_000][i % 3]
                },
                "bias_ab_bot": {"prob_low_rob": 0.25},
                "punchline_bot": {"punchline_text": "pl", "effect": "no-diff"},
            }
            for i, a in enumerate(arts)
        ]


class FakeClock:
    """Monotonic stand-in: sleeps advance it, and a service can advance
    it directly to model slow HTTP round-trips."""

    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s

    def __call__(self):
        return self.t


def _annotator(service, **kw):
    clk = FakeClock()
    ann = RESTAnnotator(
        BASE,
        api_key="k123",
        transport=service,
        sleep=clk.sleep,
        clock=clk,
        **kw,
    )
    return ann, clk.sleeps


def _articles(n=4):
    return pd.DataFrame(
        {
            "pmid": [str(100 + i) for i in range(n)],
            "title": [f"title {'x' * i}" for i in range(n)],
            "abstract_plaintext": [f"abstract {i}" for i in range(n)],
        }
    )


def test_happy_path_protocol_sequence():
    svc = FakeService(pending_polls=2)
    ann, sleeps = _annotator(svc)
    out = ann.annotate(_articles(3))
    # one queue POST, 3 status polls (2 pending + success), 1 report GET
    assert [c[0] for c in svc.calls] == ["POST", "GET", "GET", "GET", "GET"]
    assert svc.calls[1][1] == BASE + "report-status/r1"
    assert svc.calls[-1][1] == BASE + "report/r1"
    # api-key header on EVERY request
    assert all(c[2] == "k123" for c in svc.calls)
    # the two PENDING polls slept the reference's 0.3 s interval
    assert sleeps == [0.3, 0.3]
    # keys ride through; scores map from the report
    assert list(out["pmid"]) == ["100", "101", "102"]
    assert list(out["clf_score"]) == [6.0, 7.0, 8.0]
    assert list(out["clf_type"]) == ["svm_cnn"] * 3
    assert list(out["is_human"]) == [True] * 3


def test_retry_then_success_backoff_schedule():
    svc = FakeService(fail_queue_times=2)
    ann, sleeps = _annotator(svc, retry_attempts=3, backoff_s=1.0)
    out = ann.annotate(_articles(2))
    assert len(out) == 2
    # two failed queue POSTs retried with exponential backoff, then success
    assert sleeps[:2] == [1.0, 2.0]
    assert [c[0] for c in svc.calls].count("POST") == 3


def test_retries_exhausted_raises():
    svc = FakeService(fail_queue_times=99)
    ann, _ = _annotator(svc, retry_attempts=3)
    with pytest.raises(AnnotationServiceError, match="after 3 attempts"):
        ann.annotate(_articles(1))


def test_poison_batch_terminal_state():
    svc = FakeService(fail_state="FAILURE")
    ann, _ = _annotator(svc)
    with pytest.raises(AnnotationServiceError, match="poison batch"):
        ann.annotate(_articles(1))


def test_invalid_queue_response():
    class NoReportId(FakeService):
        def post_json(self, url, payload, headers):
            return {"error": "nope"}

    ann, _ = _annotator(NoReportId())
    with pytest.raises(AnnotationServiceError, match="Invalid response"):
        ann.annotate(_articles(1))


def test_poll_timeout_bounds_stuck_report():
    svc = FakeService(pending_polls=10_000)
    ann, _ = _annotator(svc, poll_timeout_s=0.9)
    with pytest.raises(AnnotationServiceError, match="not ready"):
        ann.annotate(_articles(1))


def test_poll_timeout_counts_slow_http_time():
    """A slow-but-responsive service must not overrun the wall-clock
    bound: each status round-trip burns 0.5 s of clock with NO sleeps
    scheduled, so a sleeps-only accounting would poll forever."""

    class SlowService(FakeService):
        clock = None

        def get_json(self, url, headers):
            SlowService.clock.t += 0.5
            return super().get_json(url, headers)

    svc = SlowService(pending_polls=10_000)
    clk = FakeClock()
    SlowService.clock = clk
    ann = RESTAnnotator(
        BASE, api_key="k123", transport=svc, sleep=clk.sleep, clock=clk,
        poll_timeout_s=0.9,
    )
    with pytest.raises(AnnotationServiceError, match="not ready"):
        ann.predict([{"ti": "t", "ab": "a"}], ["rct_bot"])
    # deadline fires on wall clock: 2 slow polls (1.0 s) exceed 0.9 s
    # even though only one 0.3 s sleep was ever scheduled
    assert clk.sleeps == [0.3]


def test_classify_chunking_one_request_per_batch():
    svc = FakeService()
    ann, _ = _annotator(svc, classify_batch=2)
    out = ann.annotate(_articles(5))
    assert len(out) == 5
    assert [c[0] for c in svc.calls].count("POST") == 3  # ceil(5/2)


def test_pico_mapping_and_sample_size_guard():
    svc = FakeService()
    ann, _ = _annotator(svc, pico_batch=10)
    out = ann.annotate_pico(_articles(3))
    assert list(out["pmid"]) == ["100", "101", "102"]
    # guard: "120" -> 120, "not found" -> None, 2e6 -> None
    assert out["num_randomized"].dtype == "Int64"  # integer nulls, not NaN floats
    assert out["num_randomized"][0] == 120
    assert out["num_randomized"].isna().tolist() == [False, True, True]
    assert list(out["population"]) == [["pop"]] * 3
    assert list(out["effect"]) == ["no-diff"] * 3


def test_spark_seam_swap(spark):
    """The same annotate_articles / annotate_pico_articles plumbing the
    stub runs through accepts a RESTAnnotator — proving the S20 boundary
    is deployable by injection alone (no Spark-side changes)."""
    df = spark.createDataFrame(
        [(str(100 + i), f"title {'x' * i}", f"abs {i}") for i in range(6)],
        "pmid string, title string, abstract_plaintext string",
    )
    ann = RESTAnnotator(BASE, api_key="k", transport=FakeService())
    got = annotate_articles(df, annotator=ann).orderBy("pmid").collect()
    assert len(got) == 6
    assert got[0]["clf_type"] == "svm_cnn"
    pico = annotate_pico_articles(df, annotator=ann).orderBy("pmid").collect()
    assert len(pico) == 6
    assert pico[0]["population"] == ["pop"]
