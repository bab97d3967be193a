"""Canonical domain schemas (SURVEY.md §1.3, FIXTURES.md §A).

One StructType per logical table of the destination warehouse. Script-
owned vs human-owned column split is the engine's core invariant: the
merge may only ever write script columns (requerimientos.md:113-119).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- destination targets (Code.gs:302-312, 368-378, 408-416, 443-452) ---

TRANSFERS = StructType([
    StructField("fecha", DateType()),
    StructField("folio", StringType(), nullable=False),
    StructField("cliente", StringType()),
    StructField("servicio", StringType()),
    StructField("banco", StringType()),
    StructField("monto", DoubleType()),
    StructField("conciliado", BooleanType()),       # human ✅
    StructField("concepto_banco", StringType()),    # human 💳
    StructField("observaciones", StringType()),     # human 🔍
])

CARDS = StructType([
    StructField("fecha", DateType()),
    StructField("folio", StringType(), nullable=False),
    StructField("cliente", StringType()),
    StructField("servicio", StringType()),
    StructField("monto", DoubleType()),
    StructField("recibo", BooleanType()),           # human 🧾
    StructField("afiliacion", StringType()),        # human
    StructField("lote", StringType()),              # human 📦
    StructField("observaciones", StringType()),     # human 🔍
])

CASH = StructType([
    StructField("fecha", DateType()),
    StructField("folio", StringType(), nullable=False),
    StructField("cliente", StringType()),
    StructField("servicio", StringType()),
    StructField("monto", DoubleType()),
    StructField("verificado", BooleanType()),       # human ✅
    StructField("observaciones", StringType()),     # human
])

OTHERS = StructType([
    StructField("fecha", DateType()),
    StructField("folio", StringType(), nullable=False),
    StructField("cliente", StringType()),
    StructField("servicio", StringType()),
    StructField("monto", DoubleType()),
    StructField("metodo_pago_raw", StringType()),   # script (Code.gs:1964)
    StructField("verificado", BooleanType()),       # human ✅
    StructField("observaciones", StringType()),     # human
])

AUDIT_LOG = StructType([
    StructField("ts", TimestampType()),
    StructField("folio", StringType()),
    StructField("accion", StringType()),
    StructField("detalle", StringType()),
    StructField("valores_anteriores", StringType()),
    StructField("valores_nuevos", StringType()),
    StructField("run_id", StringType()),            # idempotent-retry stamp
])

REVIEW_QUEUE = StructType([
    StructField("ts", TimestampType()),
    StructField("folio", StringType()),
    StructField("conflicto", StringType()),
    StructField("hoja_origen", StringType()),
    StructField("hoja_destino", StringType()),
    StructField("fecha", DateType()),
    StructField("cliente", StringType()),
    StructField("servicio", StringType()),
    StructField("monto", DoubleType()),
    StructField("banco", StringType()),
    StructField("conciliado", StringType()),        # 'Sí'/'No' (Code.gs:620)
    StructField("concepto_banco", StringType()),
    StructField("observaciones", StringType()),
    StructField("estado", StringType()),            # Pendiente/Resuelto
    StructField("run_id", StringType()),            # idempotent-retry stamp
])

BATCH_CLOSURES = StructType([
    StructField("fecha", DateType()),
    StructField("lote", StringType()),
    StructField("total_cierre", DoubleType()),
    StructField("depositado", BooleanType()),       # human 💰
    StructField("observaciones", StringType()),     # human
])

FOLIO_DIM = StructType([
    StructField("folio", StringType(), nullable=False),
    StructField("url", StringType()),
])

#: table name → (schema, script-owned cols, human-owned cols).
#: Script cols are what the merge may overwrite (Code.gs:1836-1844 etc.);
#: human cols are preserved verbatim and drive the R2 conflict guard.
TARGETS: dict[str, tuple[StructType, list[str], list[str]]] = {
    "transfers": (TRANSFERS, ["fecha", "folio", "cliente", "servicio", "banco", "monto"],
                  ["conciliado", "concepto_banco", "observaciones"]),
    "cards": (CARDS, ["fecha", "folio", "cliente", "servicio", "monto"],
              ["recibo", "afiliacion", "lote", "observaciones"]),
    "cash": (CASH, ["fecha", "folio", "cliente", "servicio", "monto"],
             ["verificado", "observaciones"]),
    "others": (OTHERS, ["fecha", "folio", "cliente", "servicio", "monto", "metodo_pago_raw"],
               ["verificado", "observaciones"]),
}

#: payment method → target table, in the reference's fixed probe order
#: T→C→E→O (Code.gs:1229-1240).
METHOD_TO_TABLE = {
    "TRANSFERENCIA": "transfers",
    "TARJETA": "cards",
    "EFECTIVO": "cash",
    "OTROS": "others",
}
TABLE_ORDER = ["transfers", "cards", "cash", "others"]

#: audit-log action vocabulary (Code.gs:1849, 1477, 1441, 1277, 836-841).
ACTION_NEW = "NUEVO"
ACTION_UPDATE = "ACTUALIZACIÓN"
ACTION_MOVE = "CAMBIO MÉTODO PAGO"
ACTION_CONFLICT = "CONFLICTO → REVISIÓN"
ACTION_DELETE_DETECTED = "ELIMINACIÓN DETECTADA"
ACTION_DUPLICATE = "DUPLICADO EN ORIGEN"
