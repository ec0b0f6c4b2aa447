"""Outbound alert handlers: Slack webhook + SMTP email.

Re-expresses the reference's SlackQualityAlert.scala:24-55 and
EmailQualityAlert.scala:23-140 with standard-library transports
(``urllib`` / ``smtplib`` — no extra dependencies). Both handlers take an
injectable transport so tests exercise the full message-building path
without network access, and both return delivery failures as exceptions
(raised by the DQ extension AFTER every alert was delivered, per the
handler contract in core.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from .core import AlertImportance, DataQualityAlert, DataQualityAlertHandler

# Slack attachment colors (SlackQualityAlert.scala SlackColor objects)
SLACK_COLORS = {
    AlertImportance.CRITICAL: "danger",
    AlertImportance.WARNING: "warning",
    AlertImportance.GOOD: "good",
    AlertImportance.INFORMATION: "#439FE0",
}


def _default_http_post(url: str, body: bytes, headers: dict[str, str]) -> int:
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status


class SlackQualityAlert(DataQualityAlertHandler):
    """Post alerts to a Slack incoming webhook as a colored attachment
    (SlackQualityAlert.scala:24-55).

    ``transport(url, body, headers) -> status_code`` defaults to a stdlib
    urllib POST; tests inject a stub.
    """

    def __init__(self, webhook_url: str,
                 alert_on: Sequence[AlertImportance] = (),
                 transport: Optional[Callable[[str, bytes, dict], int]] = None):
        self.webhook_url = webhook_url
        self.alert_on = tuple(alert_on)
        self.transport = transport or _default_http_post

    def to_json(self, alert: DataQualityAlert) -> str:
        return json.dumps({"attachments": [{
            "title": alert.alert_message,
            "color": SLACK_COLORS[alert.importance],
        }]})

    def handle_alert(self, alert: DataQualityAlert) -> Optional[Exception]:
        body = self.to_json(alert).encode("utf-8")
        try:
            status = self.transport(self.webhook_url, body,
                                    {"Content-Type": "application/json"})
            if not 200 <= int(status) < 300:
                return IOError(
                    f"Slack webhook returned status {status} for alert "
                    f"[{alert.alert_message}]")
        except Exception as e:
            return e
        return None


@dataclass
class SMTPEmailSettings:
    """SMTP connection + addressing settings
    (EmailQualityAlert.scala SMTPEmailSettings:86-140)."""

    host: str
    port: int = 25
    to: Sequence[str] = field(default_factory=list)
    cc: Sequence[str] = field(default_factory=list)
    bcc: Sequence[str] = field(default_factory=list)
    from_address: Optional[str] = None
    auth: bool = False
    starttls: bool = True
    ssl: bool = False
    user: Optional[str] = None
    password: Optional[str] = None
    timeout: float = 10.0

    def build_message(self, alert: DataQualityAlert):
        from email.message import EmailMessage
        from email.utils import formatdate

        msg = EmailMessage()
        msg["Subject"] = f"Data Quality Alert: {alert.importance.value}"
        msg["Date"] = formatdate()
        if self.from_address:
            msg["From"] = self.from_address
        if self.to:
            msg["To"] = ", ".join(self.to)
        if self.cc:
            msg["Cc"] = ", ".join(self.cc)
        if self.bcc:
            msg["Bcc"] = ", ".join(self.bcc)
        msg.set_content(alert.alert_message)
        return msg


def _default_smtp_send(settings: SMTPEmailSettings, msg) -> None:
    import smtplib

    cls = smtplib.SMTP_SSL if settings.ssl else smtplib.SMTP
    with cls(settings.host, settings.port,
             timeout=settings.timeout) as smtp:
        if settings.starttls and not settings.ssl:
            smtp.starttls()
        if settings.auth:
            if not (settings.user and settings.password):
                raise ValueError(
                    "Both user and password must be specified when "
                    "using auth=true")
            smtp.login(settings.user, settings.password)
        smtp.send_message(msg)


class EmailQualityAlert(DataQualityAlertHandler):
    """Send alerts as email via SMTP (EmailQualityAlert.scala:23-60).

    ``sender(settings, message)`` defaults to a stdlib smtplib session;
    tests inject a stub.
    """

    def __init__(self, settings: SMTPEmailSettings,
                 alert_on: Sequence[AlertImportance] = (),
                 sender: Optional[Callable[[SMTPEmailSettings, object],
                                           None]] = None):
        self.settings = settings
        self.alert_on = tuple(alert_on)
        self.sender = sender or _default_smtp_send

    def handle_alert(self, alert: DataQualityAlert) -> Optional[Exception]:
        try:
            self.sender(self.settings, self.settings.build_message(alert))
        except Exception as e:
            return e
        return None
