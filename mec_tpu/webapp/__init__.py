"""The web service (werkzeug WSGI + jinja2).

Serves the same 12 HTML routes and 11 JSON API endpoints as the reference
Flask app (reference app.py:124-626, catalog in SURVEY.md §3) with the
same contracts — but inverts the serving architecture: ONE process owns
the TPU and a single EmotionEngine (params loaded once, compiled graphs
shared), with a threaded WSGI front end, instead of N forked workers each
reloading every model per request (reference gunicorn_config.py:16-18,
app.py:225,256,290,336).

Flask / SQLAlchemy / bcrypt are not in this image; the equivalents here
are werkzeug routing + HMAC-signed cookie sessions + sqlite3 + scrypt.
"""

from mec_tpu.webapp.app import create_app

__all__ = ['create_app']
