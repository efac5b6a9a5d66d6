"""StreamCapture + setup_logging (reference pict/util/logging.py:52-137)."""

import io
import logging
import sys

from fluidgym_tpu.utils.logging import StreamCapture, get_logger, setup_logging


def test_stream_capture_tees(tmp_path):
    path = tmp_path / "cap.log"
    inner = io.StringIO()
    cap = StreamCapture(inner, path)
    cap.write("hello\n")
    cap.flush()
    assert inner.getvalue() == "hello\n"
    assert path.read_text() == "hello\n"
    assert cap.isatty() is False
    cap.close()


def test_setup_logging_capture_streams(tmp_path):
    orig_out, orig_err = sys.stdout, sys.stderr
    try:
        setup_logging(tmp_path, capture_streams=True)
        print("through capture")
        sys.stdout.flush()
        captured = (tmp_path / "fluidgym_tpu.log.captured").read_text()
        assert "through capture" in captured
        get_logger("x").info("to file")
        assert "to file" in (tmp_path / "fluidgym_tpu.log").read_text()
        # idempotent: a second call must not re-wrap the capture
        setup_logging(tmp_path, capture_streams=True)
        assert isinstance(sys.stdout, StreamCapture)
        assert not isinstance(sys.stdout.stream, StreamCapture)
    finally:
        if isinstance(sys.stdout, StreamCapture):
            sys.stdout.close()
            sys.stdout = sys.stdout.stream
        if isinstance(sys.stderr, StreamCapture):
            sys.stderr.close()
            sys.stderr = sys.stderr.stream
        sys.stdout, sys.stderr = orig_out, orig_err
        logging.basicConfig(force=True, handlers=[logging.StreamHandler(sys.stdout)])
