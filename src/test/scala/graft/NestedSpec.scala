package graft

import graft.operators.{ColumnHygiene, Nested}

/** Nested-data kit over Octadesk-shaped JSON fixtures (FIXTURES.md §A). */
class NestedSpec extends SparkSuite {
  import spark.implicits._

  private lazy val ticketJson = Seq(
    """{"id":"t1","number":101,"summary":"broken zipper",
        "tags":["vip","retry"],
        "status":{"name":"Aberto"},"channel":{"name":"chat"},
        "requester":{"name":"Ana","email":"ana@x.com"},
        "group":{"id":"g7"},
        "lastHumanInteraction":{"propertiesChanges":{"status":"waiting"}},
        "customField":[{"key":"cpf","value":"123"},
                       {"key":"produto","value":"uniforme"},
                       {"key":"not_whitelisted","value":"zzz"}]}""",
    """{"id":"","number":102,"summary":"no id ticket",
        "status":{"name":"Fechado"},"channel":{"name":"email"},
        "requester":{"name":"Bo","email":"bo@x.com"},
        "group":{"id":"g1"},
        "lastHumanInteraction":{"propertiesChanges":{"status":"done"}},
        "customField":[]}""").toDS()

  private lazy val tickets = spark.read.json(ticketJson)

  test("flattenStructs produces dotted json_normalize-style columns") {
    val flat = Nested.flattenStructs(tickets)
    val cols = flat.columns.toSet
    assert(cols.contains("status.name"))
    assert(cols.contains("requester.email"))
    assert(cols.contains("lastHumanInteraction.propertiesChanges.status"))
    val r = flat.filter($"id" === "t1").collect().head
    assert(r.getAs[String]("status.name") === "Aberto")
    // arrays stay intact
    assert(flat.schema("tags").dataType.typeName === "array")
  }

  test("flattened dotted names sanitize to destination-safe names") {
    val flat = ColumnHygiene.sanitizeColumns(Nested.flattenStructs(tickets))
    assert(flat.columns.toSet.contains("status_name"))
    assert(flat.columns.toSet.contains("lastHumanInteraction_propertiesChanges_status"))
  }

  test("extractWhitelistedKV pivots whitelisted keys, nulls missing ones") {
    val out = Nested.extractWhitelistedKV(tickets, "customField",
      Seq("cpf", "produto", "n_do_pedido"), "ticket_")
    val r1 = out.filter($"id" === "t1").collect().head
    assert(r1.getAs[String]("ticket_cpf") === "123")
    assert(r1.getAs[String]("ticket_produto") === "uniforme")
    assert(r1.isNullAt(r1.fieldIndex("ticket_n_do_pedido")))
    assert(!out.columns.contains("ticket_not_whitelisted"))
    val r2 = out.filter($"id" === "").collect().head
    assert(r2.isNullAt(r2.fieldIndex("ticket_cpf")))
  }

  test("pivotKV spreads dynamic kv arrays into prefixed columns") {
    val chats = Seq(
      (1L, Seq(("Regiao", "Sul"), ("bairro", "Centro"))),
      (2L, Seq(("Regiao", "Norte")))).toDF("chat_id", "kv")
      .selectExpr("chat_id",
        "transform(kv, x -> named_struct('key', x._1, 'value', x._2)) AS kv")
    val out = Nested.pivotKV(chats, Seq("chat_id"), "kv",
      Seq("Regiao", "bairro"), "cf_chat_")
    val r1 = out.filter($"chat_id" === 1L).collect().head
    assert(r1.getAs[String]("cf_chat_Regiao") === "Sul")
    assert(r1.getAs[String]("cf_chat_bairro") === "Centro")
    val r2 = out.filter($"chat_id" === 2L).collect().head
    assert(r2.isNullAt(r2.fieldIndex("cf_chat_bairro")))
  }

  test("pivotEventPresence yields evt_<type> booleans (reference/chat.py:279-287)") {
    val events = Seq((1L, "ticket"), (1L, "close"), (2L, "satisfaction"))
      .toDF("chat_id", "type")
    val out = Nested.pivotEventPresence(events, "chat_id", "type",
      Seq("ticket", "close", "satisfaction"))
    val r1 = out.filter($"chat_id" === 1L).collect().head
    assert(r1.getAs[Boolean]("evt_ticket"))
    assert(r1.getAs[Boolean]("evt_close"))
    assert(!r1.getAs[Boolean]("evt_satisfaction"))
  }
}
