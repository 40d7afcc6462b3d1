"""Failure-alert sink (reference §2.1 S12, send_email_notification at
main.py:41-54).

The reference wraps every API error in a SendGrid email.  In the
engine the analog is a driver-side alert hook wrapped around a plan's
execution: computation stays declarative, alerting is an effect at
the action boundary.  The transport is pluggable (the reference's
SendGrid client is just one transport; it is NOT bundled here --
stdlib SMTP is attempted only when explicitly configured, and tests
inject a recording fake)."""

from __future__ import annotations

from typing import Callable

#: alert(subject, message) -> None
AlertSink = Callable[[str, str], None]


def log_alert_sink(subject: str, message: str) -> None:
    """Default transport: structured log line (always available)."""
    import logging

    logging.getLogger(__name__).error("ALERT %s: %s", subject, message)


def smtp_alert_sink(
    host: str,
    from_addr: str,
    to_addr: str,
    port: int = 25,
) -> AlertSink:
    """stdlib-SMTP transport factory, the email analog of
    main.py:41-54 without the SendGrid dependency."""

    def send(subject: str, message: str) -> None:
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = f"engine alert {subject}"
        msg["From"] = from_addr
        msg["To"] = to_addr
        msg.set_content(message)
        with smtplib.SMTP(host, port, timeout=30) as s:
            s.send_message(msg)

    return send


def with_alerts(
    fn: Callable,
    *args,
    alert_sink: AlertSink = log_alert_sink,
    subject: str = "pipeline failure",
    reraise: bool = True,
    **kwargs,
):
    """Run ``fn(*args, **kwargs)``; on ANY exception, emit one alert
    with the failure context (the reference alerts per failed API
    call, main.py:67-76; here failures surface once, at the action).
    A failing alert transport never masks the original error."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 -- the alert IS the handler
        try:
            alert_sink(subject, f"{type(e).__name__}: {e}")
        except Exception as sink_err:  # alert transport down: the job error wins
            import logging

            logging.getLogger(__name__).warning(
                "alert sink failed (%s: %s); original error propagates",
                type(sink_err).__name__,
                sink_err,
            )
        if reraise:
            raise
        return None
