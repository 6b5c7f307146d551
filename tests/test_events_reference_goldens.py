"""events extractor goldens lifted from the reference's own test suite
(/root/reference/test/extract-events.js:10-330, the generic cases)."""

import pytest

from reffy_spark.extractors import extract_page

URL = "about:blank"

DEFAULT_IDL = """<pre class=idl>interface Example {
  attribute EventHandler onsuccess;
  attribute EventHandler onerror;
};</pre>"""


def default_results(fmt, success_iface="SuccessEvent"):
    return [
        {
            "type": "success",
            "interface": success_iface,
            "cancelable": True,
            "targets": ["Example"],
            "bubbles": True,
            "href": f"{URL}#success",
            "src": {"format": fmt, "href": f"{URL}#success"},
        },
        {
            "type": "error",
            "interface": "ErrorEvent",
            "cancelable": False,
            "targets": ["Example"],
            "bubbles": False,
            "href": f"{URL}#error",
            "src": {"format": fmt, "href": f"{URL}#error"},
        },
    ]


def run(html):
    return extract_page(html, URL, ["events"])["events"]


def by_type(events):
    return {e["type"]: e for e in events}


def test_summary_table_with_idl():
    html = f"""<table>
<thead>
  <tr><th>Event type</th><th>Interface</th><th>Bubbles</th><th>Cancelable</th></tr>
</thead>
<tbody>
  <tr><th><dfn id=success>success</dfn></th><td><a href=''>SuccessEvent</a></td><td>Yes</td><td>✓</td></tr>
  <tr><th><dfn id=error>error</dfn></th><td><a href=''>ErrorEvent</a></td><td>No</td><td>No</td></tr>
</tbody></table>{DEFAULT_IDL}"""
    assert run(html) == default_results("summary table")


def test_css_def_table():
    html = f"""<h3><code>success</code> Event</h3>
<table class="def" id='success'>
<tbody>
<tr><th>Type<td>success
<tr><th>Bubbles<td>Yes
<tr><th>Cancelable<td>Yes
<tr><th>Interface<td>SuccessEvent
</table>
<h3><code>error</code> Event</h3>
<table class="def" id='error'>
<tbody>
<tr><th>Type<td>error
<tr><th>Bubbles<td>no
<tr><th>Cancelable<td>no
<tr><th>Interface<td>ErrorEvent
</table>
{DEFAULT_IDL}"""
    assert run(html) == default_results("css definition table")


def test_css_dl_list_dfns():
    html = """<h3>Types of <code>ErrorEvent</code></h3>
<dl>
<dt><dfn data-dfn-for=Example data-dfn-type=event id=success>success</dfn></dt>
<dd><ul>
<li>Bubbles: Yes</li>
<li>Cancelable: Yes</li>
</ul></dd>
<dt><dfn data-dfn-for=Example data-dfn-type=event id=error>error</dfn></dt>
<dd><ul>
<li>Bubbles: No</li>
<li>Cancelable: No</li>
</ul></dd>
"""
    assert run(html) == default_results("dfn", success_iface="ErrorEvent")


def test_fire_an_event_prose_with_idl():
    html = (
        "<p id=success><a href='https://dom.spec.whatwg.org/#concept-event-fire'>"
        "Fire an event</a> named <code>success</code> using <a href=''>SuccessEvent"
        "</a> with the <code>bubbles</code> and <code>cancelable</code> attributes "
        "initialized to <code>true</code></p>"
        "<p id=error><a href='https://dom.spec.whatwg.org/#concept-event-fire'>"
        "Fire an event</a> named <code>error</code> using <a href=''>ErrorEvent</a> "
        "with the <code>bubbles</code> attribute initialized to <code>false</code> "
        "and the <code>cancelable</code> attribute set to <code>false</code></p>"
        + DEFAULT_IDL
    )
    assert run(html) == default_results("fire an event phrasing")


def test_fire_functional_event():
    html = (
        "<p id=success><a href='https://w3c.github.io/ServiceWorker/"
        "#fire-functional-event'>Fire Functional Event</a> <code>success</code> "
        "with the <code>bubbles</code> attribute initialized to <code>true</code> "
        "and the <code>cancelable</code> attribute initialized to <code>true</code></p>"
        "<p id=error><a href='https://dom.spec.whatwg.org/#concept-event-fire'>"
        "Fire an event</a> named <code>error</code> using <a href=''>ErrorEvent</a> "
        "with the <code>bubbles</code> and <code>cancelable</code> attributes "
        "initialized to <code>false</code></p>" + DEFAULT_IDL
    )
    assert run(html) == default_results(
        "fire an event phrasing", success_iface="ExtendableEvent"
    )


def test_invalid_idl_ignored():
    html = (
        "<p id=success><a href='https://w3c.github.io/ServiceWorker/"
        "#fire-functional-event'>Fire Functional Event</a> <code>success</code> "
        "with the <code>bubbles</code> attribute initialized to <code>true</code></p>"
        + DEFAULT_IDL.replace("attribute", "allezbut", 1)
    )
    assert run(html) == [
        {
            "type": "success",
            "interface": "ExtendableEvent",
            "bubbles": True,
            "href": f"{URL}#success",
            "src": {"format": "fire an event phrasing", "href": f"{URL}#success"},
        }
    ]


def test_event_dfn_definition():
    html = (
        "<p><dfn id=success data-dfn-type=event data-dfn-for=Example>success</dfn> "
        "is an event, not a state.</p>"
    )
    assert run(html) == [
        {
            "type": "success",
            "targets": ["Example"],
            "src": {"format": "dfn", "href": f"{URL}#success"},
            "href": f"{URL}#success",
        }
    ]


def test_multipage_extension_href():
    html = """<section data-reffy-page='https://example.org/indices.html'><table>
<thead>
  <tr><th>Event type</th><th>Interface</th><th>Bubbles</th></tr>
</thead>
<tbody>
  <tr><th><dfn id=success>success</dfn></th><td><a href=''>SuccessEvent</a></td><td>Yes</td></tr></tbody></table></section>"""
    assert run(html) == [
        {
            "bubbles": True,
            "type": "success",
            "interface": "SuccessEvent",
            "src": {
                "format": "summary table",
                "href": "https://example.org/indices.html#success",
            },
            "href": "https://example.org/indices.html#success",
            "isExtension": True,
        }
    ]


def test_multiple_fired_events_one_container():
    html = (
        "<p id='multievents'>If there is an error, "
        "<a href='https://dom.spec.whatwg.org/#concept-event-fire'>fire an event</a> "
        "named <dfn id='error'>error</dfn> using <a href=''>ErrorEvent</a>, otherwise "
        "<a href='https://dom.spec.whatwg.org/#concept-event-fire'>fire an event</a> "
        "named <dfn id=success>success</dfn> using <a href=''>Event</a></p>"
    )
    got = by_type(run(html))
    assert got["error"]["interface"] == "ErrorEvent"
    assert got["error"]["href"] == f"{URL}#error"
    assert got["error"]["src"]["href"] == f"{URL}#multievents"
    assert got["success"]["interface"] == "Event"
    assert got["success"]["href"] == f"{URL}#success"


def test_asides_ignored():
    html = (
        "<p id=success><a href='https://dom.spec.whatwg.org/#concept-event-fire'>"
        "Fire an event</a>\n named <code>success</code><span><span class='mdn-anno'>"
        "Info</span></span> using <a href=''>SuccessEvent</a> with the <code>bubbles"
        "</code> and <code>cancelable</code> attributes initialized to "
        "<code>true</code>.</p>"
        "<p id=error><a href='https://dom.spec.whatwg.org/#concept-event-fire'>"
        "Fire an event</a> named <code>error</code> using <a href=''>ErrorEvent</a> "
        "with the <code>bubbles</code> attribute initialized to <code>false</code> "
        "and must not be cancelable</p>" + DEFAULT_IDL
    )
    assert run(html) == default_results("fire an event phrasing")


def test_given_phrasing():
    html = (
        "<p id=success><a href='https://w3c.github.io/ServiceWorker/"
        "#fire-functional-event'>Fire Functional Event</a>\n"
        "given <code>success</code>, <code>NotificationEvent</code>.</p>"
    )
    assert run(html) == [
        {
            "href": f"{URL}#success",
            "interface": "NotificationEvent",
            "src": {"format": "fire an event phrasing", "href": f"{URL}#success"},
            "type": "success",
        }
    ]


def test_variable_names_not_extracted():
    html = (
        "<p>To fire a service worker notification event named <var>name</var>: run "
        "<a href='https://w3c.github.io/ServiceWorker/#fire-functional-event'>"
        "Fire Functional Event</a> given <var>name</var>.</p>"
    )
    assert run(html) == []


def test_event_definition_table():
    html = """<section id="events">
    <table class="event-definition">
     <tbody>
      <tr><th>Type</th><td><strong><code>auxclick</code></strong></td></tr>
      <tr><th>Interface</th><td><code>PointerEvent</code></td></tr>
      <tr><th>Bubbles</th><td>Yes</td></tr>
      <tr><th>Trusted Targets</th><td><code>Element</code>       </td></tr>
      <tr><th>Cancelable</th><td>Yes</td></tr>
     </tbody>
    </table>
    </section>"""
    assert run(html) == [
        {
            "interface": "PointerEvent",
            "src": {"format": "event table", "href": f"{URL}#events"},
            "type": "auxclick",
            "targets": ["Element"],
            "bubbles": True,
            "cancelable": True,
        }
    ]


def test_event_definition_table_linked_to_dfn():
    html = """<section id="events">
    <div class="header-wrapper">
      <h4 id="x4-4-1-auxclick">
        <bdi class="secno">4.4.1 </bdi>
        <dfn class="export" data-dfn-type="event" data-export="" id="dfn-auxclick">auxclick</dfn>
      </h4>
    </div>
    <table class="event-definition">
     <tbody>
      <tr><th>Type</th><td><strong><code>auxclick</code></strong></td></tr>
      <tr><th>Interface</th><td><code>PointerEvent</code></td></tr>
      <tr><th>Bubbles</th><td>Yes</td></tr>
      <tr><th>Trusted Targets</th><td><code>Element</code></td></tr>
      <tr><th>Cancelable</th><td>Yes</td></tr>
     </tbody>
    </table>
    </section>"""
    assert run(html) == [
        {
            "href": f"{URL}#dfn-auxclick",
            "interface": "PointerEvent",
            "src": {"format": "event table", "href": f"{URL}#events"},
            "type": "auxclick",
            "targets": ["Element"],
            "bubbles": True,
            "cancelable": True,
        }
    ]
