"""UDP-connector application on wally_spark — the reference's
`connectors/udp_source` + `connectors/udp_sink` pattern (a celsius
feed arriving as datagrams, converted, and re-emitted as datagrams)
written against this engine's relay/sink configs.

The relay (wally_spark/sources/relay.py) is the Spark-first analog of
the reference's one-connector-script-per-shard deployment: it binds
the UDP port, spools datagrams into atomically-published line files,
and Spark's file stream source consumes the spool with checkpointed
exactly-once semantics from that point on.

Run (self-contained demo — sends its own datagrams):
    PYTHONPATH=. python examples/connectors_udp.py
"""

import socket
import tempfile
import time

import pyspark.sql.functions as F

from wally_spark import api
from wally_spark.session import get_spark
from wally_spark.sinks import ReturnSink
from wally_spark.sinks.external import UDPSink
from wally_spark.sources.relay import UDPSourceConfig


def main():
    spark = get_spark("connectors-udp-example")
    spool = tempfile.mkdtemp(prefix="udp_spool_")

    src = UDPSourceConfig(
        name="udp_celsius", spool_dir=spool, host="127.0.0.1", port=0
    ).start()

    # stand-in for the external feed: a few temperature datagrams
    out = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for reading in (b"21.5", b"-3.0", b"10.0", b"37.2"):
        out.sendto(reading, ("127.0.0.1", src.bound_port))
    out.close()
    for _ in range(100):
        if len(src.read_batch(spark).collect()) >= 4:
            break
        time.sleep(0.1)
    src.stop()

    to_fahrenheit = api.computation(
        "to_fahrenheit",
        exprs={
            "celsius": F.col("value").cast("string").cast("double"),
            "fahrenheit": F.round(
                F.col("value").cast("string").cast("double") * 1.8 + 32.0, 1
            ),
        },
    )
    pipe = api.source("udp_celsius", src).to(to_fahrenheit).to_sink(ReturnSink())
    app = api.build_application("udp_celsius_app", pipe)
    result = app.run_batch(spark)
    result.show()

    # and back out as datagrams (reference udp_sink): a local listener
    # plays the downstream consumer
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(10)
    UDPSink(
        host="127.0.0.1", port=recv.getsockname()[1], value_col="fahrenheit"
    ).write_batch(result)
    got = sorted(float(recv.recvfrom(1024)[0]) for _ in range(4))
    recv.close()
    print("datagrams received downstream:", got)


if __name__ == "__main__":
    main()
