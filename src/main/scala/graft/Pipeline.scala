package graft

import graft.operators._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The reference pipeline end-to-end (SURVEY.md §3.1: main.py stages 3-7)
  * as ONE lazy DataFrame DAG.
  *
  * Where the reference eagerly materializes a pandas frame per stage on a
  * single thread, here every stage is a declarative transform on the same
  * plan: Catalyst analyzes/optimizes once (filter+projection pushdown into
  * the source scans, broadcast for the custom-field join, one shuffle for
  * the entity merge) and execution crosses the driver→executor boundary at
  * the first action. A user of the reference runs exactly this flow:
  *
  *   tickets JSON → backfill → flatten+rename → custom-field whitelist
  *   pivot → left join ⋈ tickets (main.py:91) → string casts → full-outer
  *   merge with chats on ticket number (main.py:100-103) → uuid synthesis
  *   → audit timestamp → name sanitation → dedup vs destination →
  *   duplicate-column drop → [append via Sinks.appendEvolving].
  */
object Pipeline {

  /** main.py:46-62 rename map: dotted source path → business name. */
  val ticketRenameMap: Seq[(String, String)] = Seq(
    "id" -> "uuid",
    "number" -> "n_ticket",
    "summary" -> "titulo",
    "tags" -> "tags",
    "createdAt" -> "criado_em",
    "updatedAt" -> "atualizado_em",
    "status.name" -> "status_ticket",
    "channel.name" -> "channel_ticket",
    "requester.name" -> "nome_do_requisitante",
    "requester.email" -> "email_requisitante",
    "group.id" -> "grupo_responsavel_ticket",
    "lastHumanInteraction.propertiesChanges.status" -> "ultimo_status_humano")

  /** ticket.py:71-76 custom-field whitelist. */
  val customFieldWhitelist: Seq[String] = Seq(
    "codigo_de_rastreio", "cpf", "data_de_pagamento", "email_do_cliente",
    "motivo_de_contatos", "n_da_nota_fiscal", "n_do_pedido",
    "n_do_pedido_bling", "produto", "tipo_do_problema")

  /** Ticket branch: backfill → select/rename (dotted paths) → whitelist
    * custom-field pivot → left join → casts → constant overwrite. */
  def ticketBranch(tickets: DataFrame): DataFrame = {
    // T6: absent expected columns appear as nulls (main.py:85-87)
    val expected = Seq("id", "number", "summary", "createdAt", "updatedAt")
    val backfilled = ColumnHygiene.backfill(tickets,
      expected.filterNot(tickets.columns.contains).map(_ -> StringType))
    // T7: project dotted nested paths to business names (main.py:89)
    val present = ticketRenameMap.filter { case (src, _) =>
      backfilled.columns.contains(src.split("\\.").head)
    }
    val projected = Relational.projectRename(backfilled, present)
      .withColumn("__uuid_key", col("uuid"))
    // T8+T9: whitelist pivot carried on uuid, enrichment left join — built
    // from the BACKFILLED frame so a payload with customField but no id
    // flows through with null keys like the main branch (T6 guard).
    val custom =
      if (backfilled.columns.contains("customField"))
        Nested.extractWhitelistedKV(
          backfilled.select(col("id").as("__uuid_key"), col("customField")),
          "customField", customFieldWhitelist, "ticket_")
      else projected.select(col("__uuid_key")).limit(0)
    val joined = Joins.enrichLeft(projected, custom, "__uuid_key").drop("__uuid_key")
    // T10 casts + T11 constant overwrite (the tab-guard bug means always-'')
    Relational.castAll(joined, Seq("n_ticket" -> "string"))
      .withColumn("contact_cf_n_mero_do_ticket", lit(""))
  }

  /** Full merged pipeline. `dest` is the destination's current state (for
    * T16 anti-join dedup); `uuidGen` defaults to the reference's uuid4 —
    * pass a deterministic column in tests. */
  def run(tickets: DataFrame, chats: DataFrame, dest: DataFrame,
          uuidGen: Column = expr("uuid()")): DataFrame = {
    val t = ticketBranch(tickets)
    // T12: entity merge chats ⟗ tickets (main.py:100-103)
    val merged = Joins.fullOuterMerge(chats, t,
      "evt_ticket_ticketNumber", "n_ticket", outKey = "n_ticket")
    // T13 + T14: key synthesis and audit timestamp
    val keyed = Relational.auditTimestamp(
      Relational.synthesizeKey(merged, "uuid", uuidGen))
    // T15 + T17: destination-safe names, keep-first duplicate drop
    val clean = ColumnHygiene.dropDuplicateColumns(
      ColumnHygiene.sanitizeColumns(keyed))
    // T16: drop rows whose keys already live in the destination
    val keys = Seq("number", "n_ticket").filter(k =>
      clean.columns.contains(k) && dest.columns.contains(k))
    Joins.dedupAgainst(clean, dest, keys)
  }
}
